package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, "A
  * Theory for Record Linkage", JASA 1969) — the scoring model behind
  * Splink/dedupe-style entity resolution: each candidate pair gets an
  * agreement vector over compare fields, and the match weight is the
  * log-likelihood ratio Σ_f log2(P(γ_f | match) / P(γ_f | non-match)).
  *
  * Practical estimation shortcut (standard in production linkers): the
  * u-probabilities — P(field agrees | non-match) — are estimated from
  * the candidate-pair population itself, since at corpus scale the
  * overwhelming majority of blocked pairs are non-matches; the
  * m-probabilities are supplied (domain priors, or an EM fit upstream).
  *
  * Scale shape: blocking bounds the quadratic — pairs are generated
  * ONLY within a block (self-join on the blocking key), so pair volume
  * is Σ_b C(|b|, 2), not C(n, 2). The u-estimates are one aggregate
  * over the pair stream, broadcast back; the final output is one row
  * per agreement PATTERN (2^|fields| rows), never per pair. A skewed
  * block is the hazard at 100 TB: guard with a block-size cap upstream
  * ([[graft.dedup.Dedup]]'s sorted-neighborhood tier) or salt the
  * self-join ([[graft.operators.Skew]]).
  */
object Linkage {

  /** One compare field: `agree` must evaluate to a 0/1 int over the
    * pair frame (columns of the left record are `l_<col>`, right
    * `r_<col>`), `m` is P(agree | match). */
  final case class CompareField(name: String, agree: Column, m: Double)

  /** Fellegi–Sunter weights by agreement pattern. Input `records` must
    * carry a unique long `idCol` and the blocking key `blockCol`; pairs
    * are (id_l < id_r) within a block. Output: one row per observed
    * agreement pattern — the 0/1 agreement flag per field, `n_pairs`,
    * and the pattern's match `weight` in bits — ordered by weight
    * descending (ties impossible: distinct patterns have distinct
    * weights unless m/u collide, and then the flag columns break the
    * tie deterministically via the secondary sort).
    */
  def matchWeights(records: DataFrame, idCol: String, blockCol: String,
                   fields: Seq[CompareField]): DataFrame = {
    require(fields.nonEmpty, "linkage: need at least one compare field")
    val lhs = records.columns.foldLeft(records) { (df, c) =>
      df.withColumnRenamed(c, s"l_$c") }
    val rhs = records.columns.foldLeft(records) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c") }
    val pairs = lhs.join(rhs,
        col(s"l_$blockCol") === col(s"r_$blockCol")
          && col(s"l_$idCol") < col(s"r_$idCol"))
      .select(fields.map(f => f.agree.cast("int").as(s"g_${f.name}")): _*)
    // u_f = P(agree | candidate pair): one aggregate over the pair
    // stream; joins back as a broadcast one-row frame
    val u = pairs.agg(
      fields.map(f => avg(col(s"g_${f.name}")).as(s"u_${f.name}")).head,
      fields.tail.map(f => avg(col(s"g_${f.name}")).as(s"u_${f.name}")): _*)
    val byPattern = pairs
      .groupBy(fields.map(f => col(s"g_${f.name}")): _*)
      .agg(count(lit(1)).as("n_pairs"))
    val log2 = (c: Column) => log(c) / log(lit(2.0))
    val weight = fields.map { f =>
      when(col(s"g_${f.name}") === 1, log2(lit(f.m) / col(s"u_${f.name}")))
        .otherwise(log2(lit(1.0 - f.m) / (lit(1.0) - col(s"u_${f.name}"))))
    }.reduce(_ + _)
    byPattern.crossJoin(broadcast(u))
      .select((fields.map(f => col(s"g_${f.name}"))
        :+ col("n_pairs") :+ round(weight, 4).as("weight")): _*)
      .orderBy(desc("weight") +: fields.map(f => col(s"g_${f.name}")): _*)
  }
}

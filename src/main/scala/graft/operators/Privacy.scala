package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk census over quasi-identifiers — the k-anonymity /
  * l-diversity numbers (Sweeney 2002; Machanavajjhala 2007) a dataset
  * steward checks before releasing or training on user-adjacent data:
  * how many rows sit in quasi-identifier groups small enough to
  * re-identify, and how little diversity the sensitive attribute has
  * inside a group.
  *
  * Scale shape: ONE hash aggregation keyed by the quasi-identifier
  * tuple (partial→final; state = one count + one distinct-count per
  * group — the distinct is over the sensitive column only, bounded by
  * its cardinality per group), then a scalar roll-up over the
  * group-cardinality table. Suppression/generalization decisions read
  * off the same table without rescanning the corpus.
  */
object Privacy {

  /** One-row census: total quasi-identifier groups, groups smaller
    * than `k`, rows living in those groups (the re-identifiable mass),
    * the smallest group, and the minimum per-group distinct count of
    * `sensitive` (l-diversity floor). */
  def kAnonymityCensus(df: DataFrame, quasiIds: Seq[String],
                       sensitive: Column, k: Int): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    val groups = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
      min("n").as("min_group_size"),
      min("l").as("min_l_diversity"))
  }
}

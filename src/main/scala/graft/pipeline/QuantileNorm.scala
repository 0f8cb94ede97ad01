package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quantile normalization: map each source's score
  * distribution onto the GLOBAL one, so scores from heterogeneous
  * sources become comparable before mixing or thresholding (a quality
  * score of "0.7" from a clean-web source and a forum dump mean
  * different things; after normalization, equal values mean equal
  * global standing). The microarray-era quantile-normalization recipe
  * applied corpus-side: a row at within-source percentile p takes the
  * global distribution's value at percentile p.
  *
  * Scale shape: the within-source percent_rank is a per-GROUP window
  * (each source sorts its own rows — the same cost class as any
  * per-group quantile); the global inverse-CDF is NOT a global window:
  * the global rank comes from the two-pass range-partitioned prefix
  * sum ([[Packing.withGlobalCumsumsBefore]] — single-task work is one
  * window over ~shuffle.partitions bucket totals), and the percentile
  * lookup is an equi-join on the integer rank index. Nothing sorts the
  * whole corpus in one task.
  */
object QuantileNorm {

  /** Adds `pct_rank` (within `groupCol`, percent_rank over
    * `(scoreCol, idCol)` — the id tie-break makes ranks a pure
    * function of the data) and `norm_score` (the global value at that
    * percentile: rank index `floor(p · (N−1)) + 1` in global
    * `(scoreCol, idCol)` order). Rows with NULL scores are excluded —
    * a NULL has no percentile. */
  def normalize(df: DataFrame, groupCol: String, scoreCol: String,
                idCol: String): DataFrame = {
    val rows = df.filter(col(scoreCol).isNotNull)
      .select(col(idCol), col(groupCol), col(scoreCol).cast("double").as("_s"))
    val within = Window.partitionBy(groupCol).orderBy(col("_s"), col(idCol))
    val ranked = rows.withColumn("pct_rank", percent_rank().over(within))
    // global order statistics without a global sort: exclusive running
    // row count in (_s, id) order = rank − 1
    val global = Packing
      .withGlobalCumsumsBefore(rows.select(col("_s"), col(idCol)),
        Seq(lit(1L) -> "_rk_before"), "_s", Some(idCol))
      .select((col("_rk_before") + 1L).as("_g_rk"), col("_s").as("_g_s"))
    val n = rows.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("_target",
        floor(col("pct_rank") * (col("_n") - 1)).cast("long") + 1L)
      .join(global, col("_target") === col("_g_rk"))
      .select(col(idCol), col(groupCol),
        round(col("_s"), 6).as("raw_score"),
        round(col("pct_rank"), 6).as("pct_rank"),
        round(col("_g_s"), 6).as("norm_score"))
  }
}

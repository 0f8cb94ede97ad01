package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-output diagnostics: calibration (reliability) bins and
  * weight-of-evidence feature scoring — the QA layer between a fitted
  * model ([[LogReg]], [[NaiveBayes]]) and using its scores to weight
  * or filter a corpus. Both are single-aggregation shapes: nothing
  * here holds more than per-bin state, so they run at corpus scale as
  * plain partial→final aggregates.
  */
object Calibration {

  /** Reliability diagram over fixed-width probability bins: for each
    * bin of the predicted probability `pCol` (`[i/bins, (i+1)/bins)`,
    * last bin closed), the count, mean prediction, and empirical
    * positive rate of `labelCol` — plus each bin's Brier contribution
    * `sum((p − y)²)`, whose total/n is the Brier score. Fixed-width
    * bins (not quantile) keep binning a row-local pure function — no
    * quantile pass, no sort; ONE aggregation over the scored frame. */
  def reliabilityBins(scored: DataFrame, pCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibration: need >= 2 bins, got $bins")
    val p = col(pCol).cast("double")
    val y = col(labelCol).cast("double")
    val bin = least(floor(p * bins), lit(bins - 1)).cast("int")
    scored
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(p), 6).as("mean_p"),
        round(avg(y), 6).as("pos_rate"),
        round(sum(pow(p - y, 2)), 6).as("brier_sum"))
      .orderBy("bin")
  }

  /** Exact ROC-AUC by the Mann–Whitney rank-sum identity:
    * `AUC = (Σ midrank(positives) − nPos(nPos+1)/2) / (nPos·nNeg)`,
    * with MIDRANKS so ties (repeated scores — the norm when scores
    * come from a model over discrete features) contribute exactly the
    * tie-averaged probability.
    *
    * Scale shape: scores collapse to `(score, count, n_pos)` via one
    * aggregation BEFORE any ranking (state = distinct scores, not
    * rows); the global rank base comes from the two-pass
    * range-partitioned prefix sum over that distinct-score table —
    * never a data-sized single-task window — and the final AUC is one
    * scalar aggregate. Callers should pre-round scores (e.g. 9 dp) so
    * float-noise near-ties group identically across engines/runs. */
  def aucExact(scored: DataFrame, pCol: String, labelCol: String): DataFrame = {
    val g = scored
      .groupBy(col(pCol).cast("double").as("_s"))
      .agg(count(lit(1)).as("_c"),
        sum(col(labelCol).cast("double")).as("_pos"))
    // exclusive running row count in ascending score order: every row
    // tied at score s has midrank cb + (c+1)/2
    val ranked = graft.pipeline.Packing
      .withGlobalCumsumBefore(g, col("_c"), "_s", "_cb")
    ranked.agg(
        sum(col("_pos") * (col("_cb") + (col("_c") + 1) / 2.0)).as("_pr"),
        sum("_pos").as("_np"), sum("_c").as("_n"))
      .select(col("_np").cast("long").as("n_pos"),
        (col("_n") - col("_np")).cast("long").as("n_neg"),
        round((col("_pr") - col("_np") * (col("_np") + 1) / 2.0) /
          (col("_np") * (col("_n") - col("_np"))), 6).as("auc"))
  }

  /** Weight of evidence + information value of a CATEGORICAL feature
    * against a binary label: per feature value,
    * `woe = ln((pos_share)/(neg_share))` with add-0.5 smoothing
    * (Yates), and its IV term `(pos_share − neg_share) · woe`; the
    * feature's IV is the sum — the standard screen for which features
    * deserve a model at all. One aggregation on the feature value →
    * class-total scalars broadcast back; per-value state only. */
  def woeIv(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val counts = df
      .groupBy(col(featureCol).as("value"))
      .agg(sum(y).as("n_pos"), sum(lit(1.0) - y).as("n_neg"))
    val totals = counts.agg(sum("n_pos").as("tot_pos"),
      sum("n_neg").as("tot_neg"))
    val posShare = (col("n_pos") + 0.5) / (col("tot_pos") + 0.5)
    val negShare = (col("n_neg") + 0.5) / (col("tot_neg") + 0.5)
    counts.crossJoin(broadcast(totals))
      .withColumn("woe", log(posShare / negShare))
      .select(col("value"),
        col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"),
        round(col("woe"), 6).as("woe"),
        round((posShare - negShare) * col("woe"), 6).as("iv_term"))
      .orderBy("value")
  }
}

package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMeans trip clustering (SURVEY A23, `part2.ipynb` cell 25:567-615):
  * log1p features → KMeans(k), then cluster profile summary. Uses
  * `spark.ml` directly — the distributed Lloyd's iterations replace the
  * reference's driver-side sklearn fit on a sample. */
object Clusters {

  /** Cluster events on (log1p(value), hour) and report per-cluster sizes
    * and centroids — deterministic given the fixed seed. */
  def eventClusters(events: DataFrame, k: Int = 4, seed: Long = 42L): DataFrame = {
    val feats = events.select(
      col("event_id"),
      log1p(col("value")).as("f_value"),
      hour(col("ts")).cast("double").as("f_hour"))
    // skip, don't crash: one null/NaN row (null value, or value < -1
    // making log1p NaN) must not kill the clustering job
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_value", "f_hour")).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(feats)
    // maxIter 8: the 2-D log-feature space converges in a handful of
    // Lloyd's iterations; the default 20 mostly buys repeated no-op jobs.
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("features").fit(assembled)
    model.transform(assembled)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg("f_value"), 4).as("avg_log_value"),
        round(avg("f_hour"), 4).as("avg_hour"))
      .orderBy("cluster")
  }
}

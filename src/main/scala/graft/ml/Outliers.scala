package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical anomaly detection (SURVEY A22): the reference uses sklearn
  * IsolationForest (`part2.ipynb` cell 23) driver-side on samples; the
  * supported distributed operator here is the IQR / z-score family its
  * cell 31 also uses — exact quantiles per group, then a single
  * broadcast-join of the tiny bounds table back onto the stream.
  */
object Outliers {

  /** Per-group IQR bounds + anomaly counts: value outside
    * [q1 - 1.5·IQR, q3 + 1.5·IQR]. */
  def iqrAnomalies(events: DataFrame, valueCol: String = "value",
                   groupCol: String = "event_type"): DataFrame = {
    val bounds = events
      .groupBy(groupCol)
      .agg(
        expr(s"percentile($valueCol, 0.25)").as("q1"),
        expr(s"percentile($valueCol, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    events
      .join(broadcast(bounds), groupCol)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col(valueCol) < col("lo") || col(valueCol) > col("hi"), 1))
          .as("n_anomalies"),
        round(first("lo"), 4).as("lo"),
        round(first("hi"), 4).as("hi"))
      .orderBy(groupCol)
  }
}

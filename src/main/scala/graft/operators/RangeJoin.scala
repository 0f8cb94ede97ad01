package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — Spark plans a raw
  * `l.ts BETWEEN r.start AND r.end` join as BroadcastNestedLoop or a
  * cross product. The scalable strategy: quantize time into fixed
  * buckets, explode each interval over the buckets it overlaps, and
  * equi-join on the bucket before applying the exact predicate. The
  * shuffle key becomes (bucket), the per-task work is only same-bucket
  * pairs, and bucket width tunes the fan-out/selectivity trade-off. */
object RangeJoin {

  /** Join point rows (`tsCol`, epoch-seconds granularity) to interval
    * rows [`startCol`, `endCol`] (inclusive). `bucketSeconds` should be
    * on the order of typical interval length. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    // cast accepts TIMESTAMP_NTZ inputs too (exact under the UTC session)
    def epochS(c: String) = unix_timestamp(col(c).cast("timestamp"))
    val p = points.withColumn("_bucket",
      (epochS(tsCol) / bucketSeconds).cast("long"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(
        (epochS(startCol) / bucketSeconds).cast("long"),
        (epochS(endCol) / bucketSeconds).cast("long"))))
    p.join(i, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }
}

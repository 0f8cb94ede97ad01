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

  /** Coverage-gap detection (the ANTI form of [[pointInInterval]]):
    * points matched by NO interval — "events outside every maintenance
    * window", "facts no dimension version covers". The candidate join
    * is the same bucket grid; the anti step is a LEFT ANTI on the
    * distinct matched ids, so the points table streams through once
    * and unmatched rows survive with all their columns. */
  def uncoveredPoints(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      idCol: String, bucketSeconds: Long = 3600L): DataFrame = {
    val matched = pointInInterval(points, intervals, tsCol, startCol, endCol,
        bucketSeconds)
      .select(idCol).distinct()
    points.join(matched, Seq(idCol), "left_anti")
  }

  /** Interval-overlap join: pairs of rows whose [start, end] ranges
    * intersect (inclusive; numeric columns — convert timestamps with
    * `unix_timestamp` first). Same grid strategy as [[pointInInterval]]
    * with BOTH sides exploded over their bucket spans — and each
    * overlapping pair emitted EXACTLY once without any distinct
    * shuffle: of the buckets a pair shares, only the first —
    * `max(bucket(lStart), bucket(rStart))`, which overlap guarantees
    * both sides cover — emits it. `bucketWidth` should be on the order
    * of typical interval length (it tunes explode fan-out vs same-bucket
    * pair volume).
    *
    * CONTRACT: the two frames' column names must be disjoint (alias
    * before calling), and `start <= end` on every row (`sequence()`
    * throws on a reversed interval — malformed input fails the job
    * rather than silently dropping pairs).
    *
    * SKEW GUARD: one pathological long interval over a narrow grid
    * explodes into span/width rows — unbounded fan-out that lands on a
    * single task's bucket join. `maxBucketsPerRow` caps the per-row
    * explode; a row exceeding it fails the job with a named error
    * telling the caller to widen `bucketWidth` (auto-widening silently
    * would change every other pair's shuffle volume too). The check is
    * a codegen'd filter predicate — no extra pass over the data. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long,
                      maxBucketsPerRow: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerRow > 0,
      s"maxBucketsPerRow must be positive, got $maxBucketsPerRow")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"column names must be disjoint; shared: $shared")
    def b(c: String) = floor(col(c) / bucketWidth).cast("long")
    // assert_true returns NULL when the predicate holds and throws with
    // the message otherwise; `.isNull` makes it a filter that keeps every
    // row yet cannot be pruned away
    def guarded(df: DataFrame, sC: String, eC: String) = df.filter(
      assert_true(b(eC) - b(sC) < lit(maxBucketsPerRow.toLong),
        concat(lit(s"intervalOverlap: an interval in [$sC,$eC] spans >= " +
          s"$maxBucketsPerRow buckets at bucketWidth=$bucketWidth; widen " +
          "bucketWidth or raise maxBucketsPerRow (span="),
          (b(eC) - b(sC) + 1).cast("string"), lit(" buckets)"))).isNull)
    val l = guarded(left, lStart, lEnd)
      .withColumn("_bucket", explode(sequence(b(lStart), b(lEnd))))
    val r = guarded(right, rStart, rEnd)
      .withColumn("_bucket", explode(sequence(b(rStart), b(rEnd))))
    l.join(r, Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_bucket") === greatest(b(lStart), b(rStart)))
      .drop("_bucket")
  }
}

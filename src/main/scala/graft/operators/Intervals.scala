package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval algebra: merge overlapping/touching [start, end]
  * intervals into islands and report coverage — "how much wall-clock did
  * this user/device/session-key actually occupy", the dwell-time /
  * uptime / SLA-coverage primitive (and the classic gaps-and-islands
  * exercise, done distributed).
  *
  * Scale shape: both windows are PARTITIONED BY the key — work
  * distributes across keys and no global sort or single-task window
  * exists anywhere in the plan (compare [[RangeJoin]] which buckets by
  * range instead; this operator never joins at all). A hot key with
  * millions of intervals serializes only that key's window — the same
  * bound as sessionization ([[Windows]]), and the chunked-twin trick
  * there applies verbatim if a key ever needs splitting.
  */
object Intervals {

  /** Merge per-key intervals (integer start/end, end ≥ start; touching
    * counts as overlapping) and aggregate coverage per key: island
    * count, covered units (sum of merged-island lengths), and the
    * longest island. Output: (key, n_islands, covered, max_island),
    * one row per key, ordered by key. */
  def unionCoverage(df: DataFrame, keyCol: String, startCol: String,
                    endCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    // an interval starts a NEW island iff it begins strictly after the
    // running max end of everything before it (running max, not lag:
    // an earlier long interval can swallow several short successors)
    val prevMax = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("_new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_isl",
        sum("_new").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_isl"))
      .agg(min(startCol).as("_s"), max(endCol).as("_e"))
    islands.groupBy(keyCol)
      .agg(count(lit(1)).as("n_islands"),
        sum(col("_e") - col("_s")).as("covered"),
        max(col("_e") - col("_s")).as("max_island"))
      .orderBy(keyCol)
  }

  /** Peak concurrency per key — the "max rooms in use at once" sweep
    * (interval scheduling's lower bound, = the clique number of an
    * interval graph): explode each interval to a +1 start / −1 end
    * event, running-sum in (time, delta) order, take the max. Half-open
    * [start, end) semantics: an interval ending exactly where another
    * starts does NOT overlap it, encoded by sorting the −1 before the
    * +1 at equal times. One window over 2× the interval rows per key;
    * the same hot-key bound (and chunked remedy) as sessionize. Also
    * reports when the peak is first reached — deterministic because the
    * running sum is a pure function of the totally-ordered event list. */
  def maxConcurrency(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val events = df.select(col(keyCol), col(startCol).as("_t"),
        lit(1L).as("_d"))
      .unionAll(df.select(col(keyCol), col(endCol).as("_t"),
        lit(-1L).as("_d")))
    val ord = Window.partitionBy(keyCol).orderBy(col("_t"), col("_d"))
    events
      .withColumn("_run",
        sum("_d").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_peak", max("_run").over(Window.partitionBy(keyCol)))
      .groupBy(keyCol)
      .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
        max("_peak").as("peak"),
        min(when(col("_run") === col("_peak"), col("_t"))).as("peak_at"))
      .orderBy(keyCol)
  }
}

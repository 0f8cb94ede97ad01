package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel analysis over an event stream: for a step
  * sequence like view → click → purchase, count the users who completed
  * each prefix IN ORDER (each step strictly after the user's time for
  * the previous step), optionally within a per-step maximum gap. The
  * standard product-analytics conversion query, and in a data-pipeline
  * setting the acquisition shape for any "reached stage k" cohort
  * (crawl → parse → dedup-survive → train-select would funnel the same
  * way over a lineage event log).
  *
  * Semantics: step 1's time is the user's earliest step-1 event; step
  * i's time is the earliest step-i event STRICTLY after the user's step
  * (i-1) time (and within `maxGap` of it, when set). First-occurrence
  * chaining — the greedy earliest choice at every step — is the
  * standard funnel definition; it maximizes completion under a strict
  * ordering but is NOT guaranteed maximal under `maxGap` (a later
  * step-1 event could open a window an earlier one misses; that
  * backtracking variant is a different, quadratic operator).
  *
  * Scale shape: one filtered hash aggregation per step (partial
  * min-aggregation over only that step's events — the filter prunes the
  * scan before the shuffle) plus one inner join per step, ALL keyed on
  * the user column, so after the first shuffle every later stage reuses
  * the same hash partitioning; per-user state is one timestamp per
  * step. Steps are a handful by construction, users shard freely —
  * nothing here concentrates at 100 TB.
  */
object Funnel {

  /** `(step, event_type, n_users, pct_of_first)` for each step prefix,
    * `pct_of_first` rounded to 4 places (1.0 for the first step). */
  def ordered(events: DataFrame, userCol: String, tsCol: String,
              typeCol: String, steps: Seq[String],
              maxGap: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    val stepTimes: Seq[DataFrame] = steps.zipWithIndex.foldLeft(
      List.empty[DataFrame]) { case (acc, (step, i)) =>
      val mine = events.filter(col(typeCol) === step)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      val st =
        if (i == 0) mine.groupBy("u").agg(min("t").as("t"))
        else {
          val prev = acc.head.select(col("u"), col("t").as("_pt"))
          val gapOk = maxGap.fold(lit(true))(g => col("t") <= col("_pt") + g)
          mine.join(prev, "u")
            .filter(col("t") > col("_pt") && gapOk)
            .groupBy("u").agg(min("t").as("t"))
        }
      st :: acc
    }.reverse
    val counts = stepTimes.zip(steps).zipWithIndex.map {
      case ((st, name), i) =>
        st.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("event_type"),
            col("n_users"))
    }.reduce(_.unionAll(_))
    val first = counts.filter(col("step") === 1)
      .select(col("n_users").as("_n1"))
    counts.crossJoin(broadcast(first))
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("n_users") / col("_n1"), 4).as("pct_of_first"))
      .orderBy("step")
  }

  /** Time-to-convert distribution per consecutive step pair: for each
    * user's FIRST occurrence of step i, the earliest step-(i+1) event
    * at-or-after it, summarized as conversion count plus exact median
    * and p90 latency in minutes. The "how long does the funnel take"
    * companion to [[ordered]]'s "how many make it".
    *
    * Latencies are exact microsecond differences divided by a constant
    * (one deterministic double each), so the interpolating percentiles
    * agree bit-for-bit across engines at the rounded precision.
    *
    * Scale shape per pair: one filtered min-aggregation for the entry
    * step, one user-keyed join+min against the follow step's events
    * (same hash partitioning reused), then a two-value exact percentile
    * over the converted-user tier. Pairs are a handful by construction
    * — the unioned result is pairs-sized. */
  def stepLatency(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need at least two steps, got $steps")
    val pairs = steps.zip(steps.tail).map { case (from, to) =>
      val fa = events.filter(col(typeCol) === from)
        .groupBy(col(userCol).as("_u")).agg(min(tsCol).as("_ta"))
      val nEntered = fa.agg(count(lit(1)).as("_n_entered"))
      val conv = fa.join(
          events.filter(col(typeCol) === to)
            .select(col(userCol).as("_u"), col(tsCol).as("_tb")), "_u")
        .filter(col("_tb") >= col("_ta"))
        .groupBy("_u", "_ta").agg(min("_tb").as("_tb"))
        // NTZ-safe: unix_micros rejects TIMESTAMP_NTZ; the session TZ
        // is pinned UTC, so the cast is deterministic
        .withColumn("_lat_min",
          (unix_micros(col("_tb").cast("timestamp")) -
            unix_micros(col("_ta").cast("timestamp"))) / 6.0e7)
      conv.agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(_lat_min, 0.5)"), 4).as("median_minutes"),
          round(expr("percentile(_lat_min, 0.9)"), 4).as("p90_minutes"))
        .crossJoin(broadcast(nEntered))
        .select(lit(s"$from->$to").as("step"),
          col("_n_entered").as("n_entered"), col("n_converted"),
          col("median_minutes"), col("p90_minutes"))
    }
    pairs.reduce(_.unionAll(_)).orderBy("step")
  }
}

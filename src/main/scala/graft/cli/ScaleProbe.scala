package graft.cli

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{AsOfJoin, Quality, Windows}

/** Hot-key scale probe for the per-key-ordered operators — the
  * measurement harness behind SCALE.md's "Measured 10× scale probe"
  * tables. Synthesizes an event log with one PLANTED hot key holding a
  * configurable fraction of all rows (the distribution that serializes
  * per-key-ordered windows onto one task), then runs each operator in
  * its plain and chunk-and-carry forms and reports, per run:
  *
  *   - wall-clock seconds;
  *   - total shuffle write bytes (listener-tallied across tasks);
  *   - MAX single-task duration — the serialization signal: a hot key
  *     processed in one task shows up here long before it moves total
  *     wall-clock on an otherwise-idle box;
  *   - a result checksum, asserted identical between plain and chunked
  *     forms (a fast probe that changed the answer proves nothing).
  *
  * Usage (local; SPARK_GRAFT_CPUS caps cores like Verify):
  * {{{
  * sbt "runMain graft.cli.ScaleProbe --rows 1000000 --hot-frac 0.33"
  * }}}
  * Prints one JSON line per (operator, form) for SCALE.md tables.
  */
object ScaleProbe {

  /** Per-task tallies for one measured run. Listener-based: metrics come
    * from the scheduler, so they capture exactly the jobs the thunk ran. */
  private final class Tally extends SparkListener {
    @volatile var shuffleWrite = 0L
    @volatile var maxTaskMs = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        maxTaskMs = math.max(maxTaskMs, m.executorRunTime)
      }
    }
  }

  private def measure(spark: SparkSession, name: String)
                     (thunk: => Long): (Long, Tally, Double) = {
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    val t0 = System.nanoTime()
    val checksum = thunk
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are posted async (the drain API is private[spark]);
    // a short settle keeps the task tallies complete for a probe's needs
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(tally)
    println(f"""{"op":"$name","wall_s":$wall%.2f,""" +
      f""""shuffle_write_mb":${tally.shuffleWrite / 1e6}%.1f,""" +
      f""""max_task_s":${tally.maxTaskMs / 1e3}%.2f,"checksum":$checksum}""")
    (checksum, tally, wall)
  }

  /** `rows` events over ~60 days; `hotFrac` of them on user 0, the rest
    * spread over 50k users. `ts` is MONOTONE in `event_id` (the events
    * table's shape, and the assumption the event_id-ordered operators
    * make) — the hot user sees near-continuous activity (few giant
    * sessions: the serializing regime), cold users get sparse events
    * (gaps ≫ the session gap → singleton sessions stressing the merge
    * bookkeeping). Deterministic (id-derived). */
  private def syntheticEvents(spark: SparkSession, rows: Long,
                              hotFrac: Double, parts: Int): DataFrame = {
    spark.range(0, rows, 1, parts).select(
      col("id").as("event_id"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt), 0L)
        .otherwise(pmod(hash(col("id") * 7 + 13), lit(50000L))).as("user_id"),
      timestamp_seconds(lit(1704067200L) + col("id") * lit(5184000L) / lit(rows))
        .as("ts"),
      (pmod(hash(col("id") * 17), lit(1000L)).cast("double") / 10.0).as("value"))
  }

  def main(args: Array[String]): Unit = {
    // a misspelled flag silently measuring the DEFAULT skew would
    // publish wrong SCALE.md numbers — fail loudly on anything unknown
    require(args.length % 2 == 0,
      s"flags come in --key value pairs, got: ${args.mkString(" ")}")
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap
    require(opts.size == args.length / 2,
      s"every flag must start with --, got: ${args.mkString(" ")}")
    val known = Set("rows", "hot-frac")
    require(opts.keySet.subsetOf(known),
      s"unknown flag(s): ${(opts.keySet -- known).mkString(", ")} " +
        s"(known: ${known.mkString(", ")})")
    val rows = opts.getOrElse("rows", "1000000").toLong
    val hotFrac = opts.getOrElse("hot-frac", "0.33").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-scale-probe")
    import spark.implicits._

    val events = syntheticEvents(spark, rows, hotFrac, parts = cpus * 2)
      .localCheckpoint(eager = true) // probe the operator, not the generator
    println(s"""{"probe":"hot-key","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"hot_rows":${events.filter($"user_id" === 0L).count()}}""")

    // --- sessionize: plain vs chunked ------------------------------
    def sessionChecksum(df: DataFrame): Long =
      df.agg(sum(hash(col("user_id"), col("n_sessions"),
        col("avg_session_events"), col("max_session_events"))))
        .head().getLong(0)
    val (s1, _, _) = measure(spark, "sessionize_plain") {
      sessionChecksum(Windows.sessionize(events, gapMinutes = 30))
    }
    val (s2, _, _) = measure(spark, "sessionize_chunked") {
      sessionChecksum(Windows.sessionizeChunked(events, gapMinutes = 30,
        chunkHours = 24))
    }
    require(s1 == s2, s"sessionize checksum diverged: $s1 vs $s2")

    // --- as-of join: plain vs chunked ------------------------------
    // right side: one "reading" per user per ~6h, nulls sprinkled in —
    // the shape (readings ≪ events) the operator exists for
    val readings = events.filter(pmod(col("event_id"), lit(24L)) === 0L)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(pmod(col("event_id"), lit(7L)) === 0L, lit(null).cast("double"))
          .otherwise(col("value") * 2).as("reading"))
      .localCheckpoint(eager = true)
    def asofChecksum(df: DataFrame): Long =
      df.agg(sum(hash(col("event_id"), col("asof_reading")))).head().getLong(0)
    val left = events.select("event_id", "user_id", "ts")
    val (a1, _, _) = measure(spark, "asof_plain") {
      asofChecksum(AsOfJoin.asOf(left, readings, "user_id", "ts",
        "event_id", Seq("reading")))
    }
    val (a2, _, _) = measure(spark, "asof_chunked") {
      asofChecksum(AsOfJoin.asOfChunked(left, readings, "user_id", "ts",
        "event_id", Seq("reading"), chunkHours = 24))
    }
    require(a1 == a2, s"asof checksum diverged: $a1 vs $a2")

    // --- quality report at the same volume -------------------------
    measure(spark, "quality_check") {
      Quality.check(events, Seq(
        Quality.NotNull("user_id"),
        Quality.InRange("value", 0.0, 100.0),
        Quality.Unique(Seq("event_id")),
        Quality.Satisfies("ts_in_window",
          col("ts") >= lit("2024-01-01").cast("timestamp"))))
        .agg(sum(hash(col("rule"), col("n_violations"), col("pass"))))
        .head().getLong(0)
    }

    spark.stop()
  }
}

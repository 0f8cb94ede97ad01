package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query and total
  * seconds. Each query is fully materialized via a `noop`-format write
  * (forces every operator to execute, unlike `count()` which lets Spark
  * prune aggregates). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        // bucketed-table gates use saveAsTable; keep the warehouse (and
        // its Derby metastore) out of the repo working directory
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString),
      shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once on the smallest SF so the measured
    // numbers reflect steady-state execution, not first-query JIT.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // best-of-two per query: first pass pays planning/codegen/page-cache
    // warmup and scheduler noise; the min is the steady-state number a
    // long-running service would see. A query that fails both attempts
    // must be visible in the JSON itself — a time-to-failure entry would
    // make a broken query look FAST.
    // optional family filter (comma-separated) for targeted scale probes:
    // a token matches its query when it equals the name, is an
    // underscore-delimited prefix ("d7" → d7_segment_dup_stats), or
    // equals the family's leading letters ("t" → t5…/t11…, but NOT
    // tp1_pipeline_summary, whose family is "tp")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def matches(n: String, p: String): Boolean =
      n == p || n.startsWith(p + "_") || n.takeWhile(_.isLetter) == p
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(matches(n, _))) }
      .map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      var times = (1 to 2).flatMap(_ => once())
      // Concurrent host load (the driver runs sbt alongside the bench)
      // can inflate a run 5-40×, and best-of-two still reports the
      // inflated floor when BOTH runs land under load. If the two runs
      // disagree badly on a non-trivial query, take a third sample —
      // one extra second of bench time buys round-over-round signal.
      if (times.length == 2 && times.min > 1.0 &&
          (times.max - times.min) / times.min > 0.5)
        times = times ++ once()
      if (times.isEmpty) failed += name
      name -> times.minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the driver parses the stdout tail, and with
    // ~90 per-query entries the single JSON line can fall outside the
    // captured window ("parsed": null in BENCH_r03.json). A file read is
    // robust to any stdout truncation.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}

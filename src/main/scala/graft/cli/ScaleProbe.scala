package graft.cli

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.{Dedup, DupGroups, StarComponents}
import graft.graph.PageRank
import graft.operators.{AsOfJoin, Quality, Windows}
import graft.similarity.{Ivf, Similarity}

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
    val known = Set("rows", "hot-frac", "family", "diam")
    require(opts.keySet.subsetOf(known),
      s"unknown flag(s): ${(opts.keySet -- known).mkString(", ")} " +
        s"(known: ${known.mkString(", ")})")
    val rows = opts.getOrElse("rows", "1000000").toLong
    val hotFrac = opts.getOrElse("hot-frac", "0.33").toDouble
    val family = opts.getOrElse("family", "hotkey")
    val diam = opts.getOrElse("diam", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-scale-probe")

    family match {
      case "hotkey"     => probeHotKey(spark, rows, hotFrac, cpus)
      case "dedup"      => probeMinhashBand(spark, rows, hotFrac, cpus)
      case "components" => probeComponents(spark, rows, diam, cpus)
      case "ann"        => probeIvf(spark, rows, hotFrac, cpus)
      case "graph"      => probePagerank(spark, rows, hotFrac, cpus)
      case "topk"       => probeTopK(spark, rows, hotFrac, cpus)
      case other => throw new IllegalArgumentException(
        s"unknown --family $other (known: hotkey dedup components ann graph topk)")
    }
    spark.stop()
  }

  /** The original per-key-ordered-operator probe (sessionize / as-of /
    * quality) — `--family hotkey`, the default. */
  private def probeHotKey(spark: SparkSession, rows: Long, hotFrac: Double,
                          cpus: Int): Unit = {
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
  }

  /** `--family dedup`: MinHash LSH banding under a planted MEGA-BAND —
    * `hotFrac` of the corpus is one near-identical cluster (same 40-token
    * body, per-copy unique tail), so nearly every band maps the whole
    * cluster into ONE bucket. This is the distribution where naive
    * banding emits |cluster|²/2 candidate pairs per band; the shipped
    * guard ([[Dedup.minhashNearDups]] `maxBucket`) degrades oversized
    * buckets to linear star pairs. The probe measures the guarded form
    * and asserts it is COMPONENT-EQUIVALENT to the unguarded form: both
    * edge sets, fed through [[DupGroups.connectedComponents]], must
    * label every doc identically (star pairs preserve connectivity
    * through the bucket rep — exactly the property dup-collapse needs). */
  private def probeMinhashBand(spark: SparkSession, rows: Long,
                               hotFrac: Double, cpus: Int): Unit = {
    val clusterBody = (1 to 40).map(i => s"tok${i * 7 % 53}").mkString(" ")
    val uniqueText = concat_ws(" ",
      (0 until 30).map(j => pmod(hash(col("id") * 1009 + j), lit(1000000L))): _*)
    val docs = spark.range(0, rows, 1, cpus * 2).select(
      col("id").as("doc_id"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt),
        concat(lit(clusterBody), lit(" u"), col("id")))
        .otherwise(uniqueText).as("text"))
      .localCheckpoint(eager = true)
    val clusterRows = docs.filter(col("text").startsWith(clusterBody)).count()
    println(s"""{"probe":"minhash-band","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"cluster_rows":$clusterRows}""")

    def componentChecksum(pairs: DataFrame): Long = {
      val edges = pairs.filter(col("est_jaccard") >= 0.5)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      DupGroups.connectedComponents(edges, docs.select(col("doc_id").as("id")))
        .agg(sum(hash(col("id"), col("comp")))).head().getLong(0)
    }
    val (g, _, _) = measure(spark, "minhash_guarded") {
      componentChecksum(Dedup.minhashNearDups(docs))
    }
    // the unguarded twin IS the quadratic pathology being guarded
    // against — run it (and the equivalence assertion) only while the
    // planted cluster is small enough that |cluster|²·bands stays in
    // memory; the 10× row counts measure the guarded form alone
    if (clusterRows <= 2000) {
      val (u, _, _) = measure(spark, "minhash_unguarded") {
        componentChecksum(Dedup.minhashNearDups(docs, maxBucket = Int.MaxValue))
      }
      require(g == u,
        s"star-guard changed component structure: guarded $g vs unguarded $u")
      // pair-count linearity evidence for the table
      val nG = Dedup.minhashNearDups(docs).count()
      val nU = Dedup.minhashNearDups(docs, maxBucket = Int.MaxValue).count()
      println(s"""{"probe":"minhash-band","guarded_pairs":$nG,"unguarded_pairs":$nU}""")
    } else
      println(s"""{"probe":"minhash-band","note":"cluster $clusterRows > 2000 — unguarded twin skipped"}""")
  }

  /** `--family components`: min-label propagation over `rows` nodes
    * arranged in parallel chains of length `diam`. Label propagation
    * moves one hop per round, so rounds ≡ chain diameter — constant as
    * ROWS grow (the 10× axis), linear as DIAM grows (the pathology
    * axis; real dup clusters are near-cliques with diameter ≤ 3).
    * Equivalence: integer min-label is exact, so the checksum must be
    * invariant to input partitioning. */
  private def probeComponents(spark: SparkSession, rows: Long, diam: Int,
                              cpus: Int): Unit = {
    require(diam >= 2, s"--diam must be >= 2, got $diam")
    val edges = spark.range(0, rows, 1, cpus * 2)
      .filter(pmod(col("id") + 1, lit(diam.toLong)) =!= 0 &&
        col("id") + 1 < rows)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .localCheckpoint(eager = true)
    val nodes = spark.range(rows).select(col("id"))
    println(s"""{"probe":"components","rows":$rows,"diam":$diam,""" +
      s""""cpus":$cpus,"edges":${edges.count()}}""")
    def checksum(es: DataFrame): Long =
      DupGroups.connectedComponents(es, nodes, maxIter = diam + 2)
        .agg(sum(hash(col("id"), col("comp")))).head().getLong(0)
    val (c1, _, _) = measure(spark, s"components_p3") {
      checksum(edges.repartition(3))
    }
    val (c2, _, _) = measure(spark, s"components_p${cpus * 2}") {
      checksum(edges.repartition(cpus * 2))
    }
    require(c1 == c2,
      s"component labels depend on partitioning: $c1 vs $c2")
    // the diameter-free algorithm on the same chains: rounds are
    // O(log² n) however long the chain, so the diam axis should stop
    // mattering — and the labeling must be identical
    val (c3, _, _) = measure(spark, "components_star") {
      StarComponents.connectedComponents(edges, nodes)
        .agg(sum(hash(col("id"), col("comp")))).head().getLong(0)
    }
    require(c1 == c3,
      s"star contraction diverged from label propagation: $c1 vs $c3")
  }

  /** `--family ann`: IVF search with a planted DENSE CELL — `hotFrac`
    * of all vectors sit in one tight cluster (jitter ~1e-3 around a
    * fixed point), so one inverted list holds `hotFrac`·N vectors and
    * any query probing that cell scans it exactly (the max-task
    * signal). Equivalence: probing ALL cells (`nprobe = nlist`) must
    * reproduce the brute-force top-k bitwise — same dot products, same
    * rounding, same (sim desc, vec_id) tie-break — pinning that IVF's
    * approximation comes ONLY from unprobed cells. */
  private def probeIvf(spark: SparkSession, rows: Long, hotFrac: Double,
                       cpus: Int): Unit = {
    val dim = 16
    val nlist = 16
    val hot = (0 until dim).map(j =>
      (lit(j * 0.25 - 2.0) +
        pmod(hash(col("id") * 17 + j), lit(1000L)).cast("double") / 1e6)
        .as(s"_c$j"))
    val cold = (0 until dim).map(j =>
      ((pmod(hash(col("id") * 31 + j), lit(2000L)).cast("double") - 1000.0)
        / 1000.0).as(s"_c$j"))
    val emb = spark.range(0, rows, 1, cpus * 2).select(
      col("id").as("vec_id"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt),
        array(hot: _*)).otherwise(array(cold: _*)).as("embedding"))
      .localCheckpoint(eager = true)
    val queries = (0L until 8L).toSeq
    println(s"""{"probe":"ivf-dense-cell","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"dim":$dim,"nlist":$nlist}""")
    def checksum(df: DataFrame): Long =
      df.agg(sum(hash(col("query_id"), col("rank"), col("vec_id"),
        col("sim")))).head().getLong(0)
    measure(spark, "ivf_nprobe4") {
      checksum(Ivf.ivfTopK(emb, queries, k = 5, nlist = nlist, nprobe = 4))
    }
    val (full, _, _) = measure(spark, "ivf_nprobe_all") {
      checksum(Ivf.ivfTopK(emb, queries, k = 5, nlist = nlist, nprobe = nlist))
    }
    val (brute, _, _) = measure(spark, "brute_force") {
      checksum(Similarity.bruteForceTopK(emb, queries, k = 5))
    }
    require(full == brute,
      s"IVF probing all cells diverged from brute force: $full vs $brute")
  }

  /** `--family graph`: PageRank with a planted HUB — `hotFrac` of all
    * edges point at node 0, so the per-iteration contribution aggregate
    * has one hot destination key (partial→final aggregation absorbs it
    * map-side; the probe's max-task number is the evidence).
    * Equivalence: ranks are float sums whose grouping order varies with
    * partitioning, so the cross-partitioning assertion is a bound —
    * max |Δrank| < 1e-9 node-by-node — plus hub-is-top-1 in both runs. */
  private def probePagerank(spark: SparkSession, rows: Long, hotFrac: Double,
                            cpus: Int): Unit = {
    val nSrc = math.max(rows / 10, 100L)
    val raw = spark.range(0, rows, 1, cpus * 2).select(
      pmod(hash(col("id") * 13 + 7), lit(nSrc)).as("src"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt), 0L)
        .otherwise(pmod(hash(col("id") * 29 + 3), lit(nSrc))).as("dst"))
    val edges = raw.groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("weight"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"pagerank-hub","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"distinct_edges":${edges.count()},""" +
      s""""hub_in_edges":${edges.filter(col("dst") === 0L).count()}}""")
    def run(es: DataFrame): DataFrame =
      PageRank.pagerank(es, iters = 5).localCheckpoint(eager = true)
    var r1: DataFrame = null
    var r2: DataFrame = null
    measure(spark, "pagerank_p3") {
      r1 = run(edges.repartition(3))
      r1.agg(sum(hash(col("node"), round(col("rank"), 6)))).head().getLong(0)
    }
    measure(spark, s"pagerank_p${cpus * 2}") {
      r2 = run(edges.repartition(cpus * 2))
      r2.agg(sum(hash(col("node"), round(col("rank"), 6)))).head().getLong(0)
    }
    val maxDiff = r1.withColumnRenamed("rank", "r1")
      .join(r2.withColumnRenamed("rank", "r2"), "node")
      .agg(max(abs(col("r1") - col("r2")))).head().getDouble(0)
    println(s"""{"probe":"pagerank-hub","max_abs_rank_diff":$maxDiff}""")
    require(maxDiff < 1e-9,
      s"ranks diverged across partitionings: max |Δ| = $maxDiff")
    Seq(r1, r2).foreach { r =>
      val top = r.orderBy(desc("rank")).select("node").head().getLong(0)
      require(top == 0L, s"hub is not top-ranked: node $top")
    }
  }

  /** `--family topk`: top-3 per group with ONE PLANTED MEGA-GROUP
    * (`hotFrac` of all rows on group 0, the rest over 200 groups) —
    * the regime where [[graft.operators.TopK]]'s O(k)-state aggregate
    * must beat the `row_number` window, whose hot partition SORTS the
    * whole mega-group to keep 3 rows, and where map-side combine
    * collapses each task's per-group rows to ≤k before any exchange
    * (with groups ≈ rows the partials can't compress and the two
    * routes converge — that regime is the window's, and the measured
    * table in SCALE.md shows both). Both routes must agree bitwise
    * (same (value desc, id asc) order contract), asserted by checksum. */
  private def probeTopK(spark: SparkSession, rows: Long, hotFrac: Double,
                        cpus: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, rows, 1, cpus * 2).select(
        col("id"),
        when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt), 0L)
          .otherwise(pmod(hash(col("id") * 7 + 13), lit(200L))).as("g"),
        (pmod(hash(col("id") * 17), lit(1000000L)).cast("double") / 100.0)
          .as("v"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"topk-hot-group","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"hot_rows":${df.filter(col("g") === 0L).count()}}""")
    def checksum(r: DataFrame): Long =
      r.agg(sum(hash(col("g"), col("rank"), col("id"), col("v"))))
        .head().getLong(0)
    val (heap, _, _) = measure(spark, "topk_heap_agg") {
      checksum(graft.operators.TopK.topKByGroup(df, "g", "v", "id", k = 3))
    }
    val (win, _, _) = measure(spark, "topk_window_sort") {
      val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
      checksum(df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3).select("g", "rank", "id", "v"))
    }
    require(heap == win,
      s"heap top-k diverged from the window oracle: $heap vs $win")
  }
}

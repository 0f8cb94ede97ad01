package graft.cli

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.{Dedup, DupGroups, ExactSubstr, StarComponents}
import graft.graph.{Ktruss, PageRank}
import graft.operators.{AsOfJoin, Quality, Relational, Windows}
import graft.similarity.{Ivf, Pq, SemDedup, Similarity}
import graft.text.Bpe

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
    val known = Set("rows", "hot-frac", "family", "diam", "merges")
    require(opts.keySet.subsetOf(known),
      s"unknown flag(s): ${(opts.keySet -- known).mkString(", ")} " +
        s"(known: ${known.mkString(", ")})")
    val rows = opts.getOrElse("rows", "1000000").toLong
    val hotFrac = opts.getOrElse("hot-frac", "0.33").toDouble
    val family = opts.getOrElse("family", "hotkey")
    val diam = opts.getOrElse("diam", "16").toInt
    val nMerges = opts.getOrElse("merges", "32").toInt
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
      case "substr"     => probeSubstr(spark, rows, hotFrac, cpus)
      case "bpe"        => probeBpe(spark, rows, hotFrac, nMerges, cpus)
      case "truss"      => probeTruss(spark, rows, hotFrac, cpus)
      case "pq"         => probePq(spark, rows, hotFrac, cpus)
      case "semdedup"   => probeSemDedup(spark, rows, hotFrac, cpus)
      case "xcorpus"    => probeCrossCorpus(spark, rows, hotFrac, cpus)
      case "scc"        => probeScc(spark, rows, hotFrac, cpus)
      case "kmv"        => probeKmv(spark, rows, hotFrac, cpus)
      case "unigram"    => probeUnigram(spark, rows, cpus)
      case "screen"     => probeScreenState(spark, rows, cpus)
      case "bandappend" => probeBandAppend(spark, rows, cpus)
      case other => throw new IllegalArgumentException(
        s"unknown --family $other (known: hotkey dedup components ann graph " +
          "topk substr bpe truss pq semdedup xcorpus scc kmv unigram screen " +
          "bandappend)")
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

  /** `--family substr`: exact-substring dedup under a planted MEGA-SPAN
    * — `hotFrac` of docs share one 30-token body (unique 5-token
    * prefix/suffix per copy), so every interior 8-shingle of the body
    * has a posting list of size hotFrac·N: the hot-key regime for both
    * the duplicated-shingle count (absorbed by partial→final agg) and
    * the semi-join back to postings (ordinary join skew). Cold docs are
    * 40 unique tokens and must produce NO spans. Equivalence: span and
    * strip checksums invariant across input partitionings. */
  private def probeSubstr(spark: SparkSession, rows: Long, hotFrac: Double,
                          cpus: Int): Unit = {
    val body = (1 to 30).map(i => s"b${i * 13 % 97}x").mkString(" ")
    def uniq(tag: Int, n: Int) = concat_ws(" ",
      (0 until n).map(j => concat(lit("u"),
        pmod(hash(col("id") * (1009 + tag) + j), lit(100000000L))
          .cast("string"))): _*)
    val docs = spark.range(0, rows, 1, cpus * 2).select(
      col("id").as("doc_id"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt),
        concat_ws(" ", uniq(1, 5), lit(body), uniq(2, 5)))
        .otherwise(uniq(3, 40)).as("text"))
      .localCheckpoint(eager = true)
    val hotDocs = docs.filter(col("text").contains(body)).count()
    println(s"""{"probe":"substr-megaspan","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"hot_docs":$hotDocs}""")
    def spanChecksum(d: DataFrame): Long =
      ExactSubstr.duplicatedSpans(d, k = 8)
        .agg(sum(hash(col("doc_id"), col("span_start"), col("span_end"),
          col("span_len")))).head().getLong(0)
    def stripChecksum(d: DataFrame): Long =
      ExactSubstr.stripSpans(d, k = 8)
        .agg(sum(hash(col("doc_id"), col("n_before"), col("n_after"),
          col("clean_text")))).head().getLong(0)
    val (s1, _, _) = measure(spark, "substr_spans_p3") {
      spanChecksum(docs.repartition(3))
    }
    val (s2, _, _) = measure(spark, s"substr_spans_p${cpus * 2}") {
      spanChecksum(docs.repartition(cpus * 2))
    }
    require(s1 == s2, s"span cut list depends on partitioning: $s1 vs $s2")
    val (t1, _, _) = measure(spark, "substr_strip_p3") {
      stripChecksum(docs.repartition(3))
    }
    val (t2, _, _) = measure(spark, s"substr_strip_p${cpus * 2}") {
      stripChecksum(docs.repartition(cpus * 2))
    }
    require(t1 == t2, s"stripped corpus depends on partitioning: $t1 vs $t2")
    // every span row must belong to a hot doc (cold docs are unique)
    val spanned = ExactSubstr.duplicatedSpans(docs, k = 8)
      .select("doc_id").distinct().count()
    println(s"""{"probe":"substr-megaspan","docs_with_spans":$spanned}""")
    require(spanned == hotDocs,
      s"span coverage wrong: $spanned docs spanned vs $hotDocs planted")
  }

  /** `--family bpe`: merge training under a SKEWED symbol-pair
    * distribution — `hotFrac` of docs are pure 'z' runs (pair "z z"
    * dominates round 1, and each merge of a run pair immediately
    * recreates mass on the merged symbol's self-pair: the worst case
    * for delta churn on the count table); the rest are hash-derived
    * words over an 8-letter alphabet. Reports wall at `merges/4` and
    * `merges` rounds — per-round cost must stay flat in the merge index
    * — and asserts the delta-counting trainer is bit-identical to the
    * full-recount reference and invariant to input partitioning. */
  private def probeBpe(spark: SparkSession, rows: Long, hotFrac: Double,
                       nMerges: Int, cpus: Int): Unit = {
    val docs = spark.range(0, rows, 1, cpus * 2).select(
      col("id").as("doc_id"),
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt),
        repeat(lit("z"), (pmod(hash(col("id") * 3 + 1), lit(5)) + 4).cast("int")))
        .otherwise(translate(
          conv(pmod(hash(col("id") * 31 + 7), lit(10000000L)).cast("string"),
            10, 8),
          "01234567", "abcdefgh")).as("text"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"bpe-skewed-pairs","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"merges":$nMerges,""" +
      s""""vocab":${docs.select("text").distinct().count()}}""")
    def sig(ms: Seq[Bpe.Merge]): Long =
      ms.map(m => s"${m.step}:${m.pair}:${m.pair_count}").mkString("|")
        .hashCode.toLong
    val quarter = math.max(nMerges / 4, 1)
    measure(spark, s"bpe_delta_m$quarter") {
      sig(Bpe.train(docs, quarter)._1)
    }
    val (dn, _, wDist) = measure(spark, s"bpe_delta_m$nMerges") {
      sig(Bpe.train(docs, nMerges)._1)
    }
    val eqM = math.min(nMerges, 8)
    val (d8, _, _) = measure(spark, s"bpe_delta_m${eqM}_eq") {
      sig(Bpe.train(docs, eqM)._1)
    }
    val (r8, _, _) = measure(spark, s"bpe_recount_m${eqM}_eq") {
      sig(Bpe.trainRecount(docs, eqM)._1)
    }
    require(d8 == r8,
      s"delta counting diverged from full recount: $d8 vs $r8")
    val p3 = sig(Bpe.train(docs.repartition(3), eqM)._1)
    require(d8 == p3, s"merge table depends on partitioning: $d8 vs $p3")
    // the driver-local tier: identical merge table, and the wall ratio
    // vs the distributed loop at the SAME merge count is the measured
    // escape from train's one-Spark-job-per-round scheduling floor
    // (30k production merges = 30k sequential jobs — hours on
    // scheduling alone; trainLocal's loop is in-process after one
    // vocab-sized collect)
    val (ln, _, wLocal) = measure(spark, s"bpe_local_m$nMerges") {
      sig(Bpe.trainLocal(docs, nMerges)._1)
    }
    require(dn == ln,
      s"trainLocal diverged from train at m=$nMerges: $dn vs $ln")
    println(f"""{"probe":"bpe-local-tier","merges":$nMerges,""" +
      f""""wall_dist_s":$wDist%.2f,"wall_local_s":$wLocal%.2f,""" +
      f""""speedup":${wDist / math.max(wLocal, 1e-3)}%.1f}""")
  }

  /** `--family bandappend`: the band-index PERSISTENCE cost, measured —
    * `rows` docs arrive as 4 equal ingest batches (every consecutive id
    * pair sharing a text, the screen-probe corpus shape). Two
    * lifecycles persist the same index: (a) `appendBandIndex` — each
    * batch writes ONLY its own `batch=<n>/` delta; (b) the pre-round-13
    * shape — fold with `compactBandIndex`, then `saveBandIndex` the
    * FULL accumulated index every batch. Bytes written per batch must
    * stay flat under (a) while (b)'s final save rewrites the whole
    * corpus (quadratic cumulative volume over an ingest); all three
    * artifacts (append-loaded, rewrite-loaded, fresh in-session build)
    * must screen a probe batch identically. */
  private def probeBandAppend(spark: SparkSession, rows: Long,
                              cpus: Int): Unit = {
    val nBatches = 4
    val per = rows / nBatches
    def mkDocs(lo: Long, hi: Long, idOffset: Long = 0L) =
      spark.range(lo, hi, 1, cpus).select(
        (col("id") + idOffset).as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit("w"), pmod(hash(floor(col("id") / 2).cast("long") * 31 + j),
            lit(100000L)))): _*).as("text"))
        .localCheckpoint(eager = true)
    def du(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(x => du(x.getPath)).sum
    }
    val rootPath = java.nio.file.Files.createTempDirectory("graft_bandappend")
    val root = rootPath.toString
    println(s"""{"probe":"band-append","rows":$rows,"batches":$nBatches,""" +
      s""""cpus":$cpus}""")
    try {
      // (a) append-only lifecycle
      Dedup.saveBandIndex(Dedup.buildBandIndex(mkDocs(0, per),
        reproducible = true), s"$root/app")
      var prev = du(s"$root/app")
      val appBytes = (1 until nBatches).map { k =>
        val (_, _, w) = measure(spark, s"band_append_b$k") {
          Dedup.appendBandIndex(spark, s"$root/app",
            mkDocs(k * per, (k + 1) * per)).toLong
        }
        val cur = du(s"$root/app")
        val delta = cur - prev
        prev = cur
        println(s"""{"probe":"band-append","mode":"append","batch":$k,""" +
          f""""bytes_written":$delta,"wall_s":$w%.2f}""")
        delta
      }
      // (b) fold + full-rewrite-per-batch lifecycle
      var idx = Dedup.buildBandIndex(mkDocs(0, per), reproducible = true)
      Dedup.saveBandIndex(idx, s"$root/rw")
      val rwBytes = (1 until nBatches).map { k =>
        idx = Dedup.compactBandIndex(idx, mkDocs(k * per, (k + 1) * per))
        val (_, _, w) = measure(spark, s"band_rewrite_b$k") {
          Dedup.saveBandIndex(idx, s"$root/rw"); k.toLong
        }
        val b = du(s"$root/rw") // overwrite: dir size == bytes this save
        println(s"""{"probe":"band-append","mode":"rewrite","batch":$k,""" +
          f""""bytes_written":$b,"wall_s":$w%.2f}""")
        b
      }
      // equivalence: a probe batch (clone texts of the first corpus
      // docs, fresh ids) screens identically from all three artifacts
      val probe = mkDocs(0, math.min(per, 1024), idOffset = 1000000000L)
      def chk(ix: Dedup.BandIndex): Long =
        Dedup.screenAgainstIndex(probe, ix)
          .filter(col("est_jaccard") >= 0.5)
          .agg(coalesce(sum(col("doc_in") % 1000000L * 7 + col("doc_corpus")),
            lit(0L)))
          .head().getLong(0)
      val cApp = chk(Dedup.loadBandIndex(spark, s"$root/app"))
      val cRw = chk(Dedup.loadBandIndex(spark, s"$root/rw"))
      val cFresh = chk(Dedup.buildBandIndex(mkDocs(0, rows),
        reproducible = true))
      require(cApp == cRw && cApp == cFresh,
        s"lifecycles diverged: append=$cApp rewrite=$cRw fresh=$cFresh")
      require(cApp != 0L, "probe batch matched nothing — degenerate fixture")
      // append bytes flat in batch number; the rewrite's final save
      // pays the whole accumulated index
      require(appBytes.last < 2 * appBytes.head,
        s"append bytes not flat: ${appBytes.mkString(",")}")
      require(rwBytes.last > 2 * appBytes.last,
        s"rewrite did not dominate append: rw=${rwBytes.mkString(",")} " +
          s"app=${appBytes.mkString(",")}")
    } finally graft.Fs.deleteRecursively(rootPath)
  }

  /** `--family truss`: k-truss peeling with a planted DENSE CORE — a
    * clique of c ≈ √(2·rows·hotFrac) nodes (so clique edges ≈
    * hotFrac·rows) plus triangle-free chain filler. Every clique node
    * has degree c−1: the oriented wedge pass must absorb the core
    * without a task-serializing hot key, the chains must drop in round
    * 1 (no triangle support). Checksum invariant across input
    * partitionings. */
  private def probeTruss(spark: SparkSession, rows: Long, hotFrac: Double,
                         cpus: Int): Unit = {
    val c = math.max(4L, math.sqrt(2.0 * rows * hotFrac).toLong)
    val clique = spark.range(c - 1).select(col("id").as("a"),
      explode(sequence(col("id") + 1, lit(c - 1))).as("b"))
    val nClique = c * (c - 1) / 2
    val chainRows = math.max(rows - nClique, 0L)
    val chains = spark.range(0, chainRows, 1, cpus * 2)
      .select((col("id") + 1000000000L).as("a"),
        (col("id") + 1000000001L).as("b"))
    val edges = clique.unionByName(chains)
      .select(col("a").as("src"), col("b").as("dst"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"truss-dense-core","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"clique_nodes":$c,"clique_edges":$nClique,""" +
      s""""chain_edges":$chainRows}""")
    def checksum(es: DataFrame): Long =
      Ktruss.trussHistogram(es, k = 4, rounds = 3)
        .agg(sum(hash(col("support"), col("n_edges")))).head().getLong(0)
    val (k1, _, _) = measure(spark, "truss_p3") {
      checksum(edges.repartition(3))
    }
    val (k2, _, _) = measure(spark, s"truss_p${cpus * 2}") {
      checksum(edges.repartition(cpus * 2))
    }
    require(k1 == k2, s"truss census depends on partitioning: $k1 vs $k2")
    // the census must be exactly the clique: every surviving edge has
    // support c-2, and there are c(c-1)/2 of them
    val census = Ktruss.trussHistogram(edges, k = 4, rounds = 3).collect()
    require(census.length == 1 && census(0).getLong(0) == c - 2 &&
      census(0).getLong(1) == nClique,
      s"dense core not preserved exactly: ${census.mkString(", ")}")
  }

  /** `--family pq`: product quantization with ONE FAT CELL — `hotFrac`
    * of vectors sit in a tight cluster, so one codeword per subspace
    * absorbs that fraction of all blocks and the ADC postings join has
    * one hot (block, code) key (ordinary join skew; the LUT side is
    * broadcast). Codes are exact ints: the encode checksum must be
    * invariant to input partitioning under a FIXED model. ADC walls are
    * reported; the fat-code fraction is printed as the pathology
    * evidence. */
  private def probePq(spark: SparkSession, rows: Long, hotFrac: Double,
                      cpus: Int): Unit = {
    val dim = 16
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
    println(s"""{"probe":"pq-fat-cell","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"dim":$dim}""")
    var model: Pq.Model = null
    measure(spark, "pq_train") {
      model = Pq.train(emb, m = 4, k = 16)
      model.codebooks.agg(sum(hash(col("block"), col("code"))))
        .head().getLong(0)
    }
    def codesChecksum(e: DataFrame): Long =
      Pq.encode(e, model)
        .agg(sum(hash(col("vec_id"), col("codes")))).head().getLong(0)
    val (e1, _, _) = measure(spark, "pq_encode_p3") {
      codesChecksum(emb.repartition(3))
    }
    val (e2, _, _) = measure(spark, s"pq_encode_p${cpus * 2}") {
      codesChecksum(emb.repartition(cpus * 2))
    }
    require(e1 == e2, s"codes depend on partitioning: $e1 vs $e2")
    val codes = Pq.encode(emb, model).localCheckpoint(eager = true)
    // fat-cell evidence: the max share any single (block, code) holds
    val fat = codes
      .select(posexplode(col("codes")).as(Seq("block", "code")))
      .groupBy("block", "code").count()
      .agg((max("count") / sum("count") * 4).as("frac")).head().getDouble(0)
    println(f"""{"probe":"pq-fat-cell","fat_code_frac":$fat%.3f}""")
    measure(spark, "pq_adc_topk") {
      Pq.adcTopK(codes, emb, model, 0L until 8L, kNN = 5)
        .agg(sum(hash(col("query_id"), col("rank"), col("vec_id"))))
        .head().getLong(0)
    }
  }

  /** `--family xcorpus`: the ingest-time screen under a planted CORPUS
    * MEGA-CLUSTER — `hotFrac` of the corpus is one near-identical
    * family, and the same fraction of a 10×-smaller incoming batch
    * clones it too. Every incoming clone's bands all land in the
    * cluster's buckets: unguarded, each probe pairs against the WHOLE
    * cluster (probes × |cluster| candidates); the corpus-side bucket
    * guard degrades that to one hub pair per probe. The probe measures
    * the guarded form and asserts the screen's DECISION SET (which
    * incoming docs matched at τ) is identical to the unguarded twin's
    * while the cluster is small enough to enumerate. */
  private def probeCrossCorpus(spark: SparkSession, rows: Long,
                               hotFrac: Double, cpus: Int): Unit = {
    val clusterBody = (1 to 40).map(i => s"tok${i * 7 % 53}").mkString(" ")
    def docs(n: Long, offset: Long) = {
      val uniqueText = concat_ws(" ",
        (0 until 30).map(j =>
          pmod(hash((col("id") + offset) * 1009 + j), lit(1000000L))): _*)
      spark.range(0, n, 1, cpus * 2).select(
        (col("id") + offset).as("doc_id"),
        when(pmod(hash(col("id") + offset), lit(1000))
            < lit((hotFrac * 1000).toInt),
          concat(lit(clusterBody), lit(" u"), col("id") + offset))
          .otherwise(uniqueText).as("text"))
        .localCheckpoint(eager = true)
    }
    val corpus = docs(rows, 0L)
    val incoming = docs(rows / 10, rows)
    val clusterRows = corpus.filter(col("text").startsWith(clusterBody)).count()
    val probeRows = incoming.filter(col("text").startsWith(clusterBody)).count()
    println(s"""{"probe":"xcorpus-megacluster","rows":$rows,""" +
      s""""hot_frac":$hotFrac,"cpus":$cpus,"cluster_rows":$clusterRows,""" +
      s""""incoming_clones":$probeRows}""")
    def decisionChecksum(pairs: DataFrame): Long =
      pairs.filter(col("est_jaccard") >= 0.5)
        .select("doc_in").distinct()
        .agg(sum(hash(col("doc_in")))).head().getLong(0)
    val (g, _, _) = measure(spark, "xcorpus_guarded") {
      decisionChecksum(Dedup.crossCorpusNearDups(incoming, corpus))
    }
    if (clusterRows <= 2000) {
      val (u, _, _) = measure(spark, "xcorpus_unguarded") {
        decisionChecksum(Dedup.crossCorpusNearDups(incoming, corpus,
          maxBucket = Int.MaxValue))
      }
      require(g == u,
        s"corpus bucket guard changed the screen decision: $g vs $u")
      val nG = Dedup.crossCorpusNearDups(incoming, corpus).count()
      val nU = Dedup.crossCorpusNearDups(incoming, corpus,
        maxBucket = Int.MaxValue).count()
      println(s"""{"probe":"xcorpus-megacluster","guarded_pairs":$nG,""" +
        s""""unguarded_pairs":$nU}""")
    } else
      println(s"""{"probe":"xcorpus-megacluster",""" +
        s""""note":"cluster $clusterRows > 2000 — unguarded twin skipped"}""")
    // skewed-INCOMING shape (round-10 VERDICT item 6): EVERY incoming
    // doc clones the corpus mega-cluster, so all probes land in the
    // SAME oversized corpus bucket in every band. The corpus-side
    // guard must bound the blowup from the incoming side too: each
    // probe yields only (doc_in, rep) pairs — at most incoming×bands
    // BEFORE dedup, ≤ incoming after — never probes×|cluster|. The
    // invariant is asserted, not eyeballed.
    val nIn = rows / 10
    val incomingSkew = spark.range(0, nIn, 1, cpus * 2).select(
      (col("id") + 2 * rows).as("doc_id"),
      concat(lit(clusterBody), lit(" u"), col("id") + 2 * rows).as("text"))
      .localCheckpoint(eager = true)
    val bands = 16L
    val (sk, _, _) = measure(spark, "xcorpus_skewed_incoming") {
      val pairs = Dedup.crossCorpusNearDups(incomingSkew, corpus)
        .localCheckpoint(eager = true)
      val n = pairs.count()
      require(n <= nIn * bands,
        s"skewed-incoming pair count $n exceeds incoming×bands " +
          s"(${nIn * bands}) — the corpus-side guard failed to bound " +
          "the incoming-side blowup")
      n * 1000000L + pairs.filter(col("est_jaccard") >= 0.5)
        .select("doc_in").distinct().count()
    }
    println(s"""{"probe":"xcorpus-skewed-incoming","incoming":$nIn,""" +
      s""""pairs_and_decisions":$sk,"bound":${nIn * bands}}""")
  }

  /** `--family scc`: FW–BW peeling under a planted GIANT SCC —
    * `hotFrac` of the nodes form one strongly connected block (a ring
    * for guaranteed strong connectivity plus one random chord per node
    * so the propagation diameter is O(log C), the realistic shape;
    * a bare ring would honestly need diameter rounds and trip
    * maxPropRounds — the documented pathology) and the rest form a
    * random DAG periphery (two edges each to strictly smaller ids,
    * some landing inside the block). The planted labeling is
    * closed-form — block members carry scc 0, periphery nodes are
    * singletons — so recovery is asserted EXACTLY, not spot-checked. */
  private def probeScc(spark: SparkSession, rows: Long, hotFrac: Double,
                       cpus: Int): Unit = {
    val c = math.max(4L, (rows * hotFrac).toLong)
    val ids = spark.range(0, rows, 1, cpus * 2)
    val ring = ids.filter(col("id") < c)
      .select(col("id").as("src"), ((col("id") + 1) % c).as("dst"))
    val chords = ids.filter(col("id") < c)
      .select(col("id").as("src"), pmod(hash(col("id") * 13 + 7), lit(c)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val periphery = ids.filter(col("id") >= c)
      .select(col("id").as("src"),
        pmod(hash(col("id") * 31 + 3), col("id")).as("dst"))
      .union(ids.filter(col("id") >= c)
        .select(col("id").as("src"),
          pmod(hash(col("id") * 17 + 11), col("id")).as("dst")))
    val edges = ring.union(chords).union(periphery)
      .localCheckpoint(eager = true)
    println(s"""{"probe":"scc-giant","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"block_size":$c,"edges":${edges.count()}}""")
    val (chk, _, _) = measure(spark, "scc_fwbw") {
      val labels = graft.graph.Scc.components(edges)
      // planted recovery, exact: block -> 0, periphery -> self
      val wrong = labels.filter(
        when(col("node") < c, col("scc") =!= 0)
          .otherwise(col("scc") =!= col("node"))).count()
      require(wrong == 0, s"$wrong nodes deviate from the planted labeling")
      labels.agg(sum(hash(col("node"), col("scc")))).head().getLong(0)
    }
    println(s"""{"probe":"scc-giant","checksum":$chk""" +
      s""","levels":${graft.graph.Scc.lastLevels}""" +
      s""","max_prop_rounds":${graft.graph.Scc.lastMaxPropRounds}}""")
    // the two NAMED pathologies of the round-10 O(diameter) form,
    // planted at full probe size: a bare `rows`-cycle (one giant SCC of
    // diameter `rows` — the old color step needed `rows` rounds and
    // refused at 64) and a `rows`-deep singleton chain (the old trim
    // peeled one end per round). Done = completion under the fixed
    // logarithmic bounds, with the level / propagation-round counts
    // printed for SCALE.md's growth table.
    val cycle = ids.select(col("id").as("src"),
      ((col("id") + 1) % rows).as("dst")).localCheckpoint(eager = true)
    val (cchk, _, _) = measure(spark, "scc_bare_cycle") {
      val labels = graft.graph.Scc.components(cycle)
      val wrong = labels.filter(col("scc") =!= 0).count()
      require(wrong == 0, s"$wrong nodes deviate from the planted cycle")
      labels.agg(sum(hash(col("node"), col("scc")))).head().getLong(0)
    }
    println(s"""{"probe":"scc-cycle","rows":$rows,"checksum":$cchk""" +
      s""","levels":${graft.graph.Scc.lastLevels}""" +
      s""","max_prop_rounds":${graft.graph.Scc.lastMaxPropRounds}}""")
    val chain = ids.filter(col("id") < rows - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .localCheckpoint(eager = true)
    val (hchk, _, _) = measure(spark, "scc_deep_chain") {
      val labels = graft.graph.Scc.components(chain)
      val wrong = labels.filter(col("scc") =!= col("node")).count()
      require(wrong == 0, s"$wrong nodes deviate from the planted chain")
      labels.agg(sum(hash(col("node"), col("scc")))).head().getLong(0)
    }
    println(s"""{"probe":"scc-chain","rows":$rows,"checksum":$hchk""" +
      s""","levels":${graft.graph.Scc.lastLevels}""" +
      s""","max_prop_rounds":${graft.graph.Scc.lastMaxPropRounds}}""")
  }

  /** `--family kmv`: the bottom-k sketch under ONE PLANTED GIANT GROUP —
    * `hotFrac` of all rows land in a single group whose values are all
    * distinct (the billion-distinct regime scaled down), the rest
    * spread over 50 cold groups. The round-10 form sorted EVERY
    * distinct hash per group through the bottom-k window; the
    * threshold-prefiltered [[Relational.kmvBottomK]] path must produce
    * the BIT-IDENTICAL sketch table while its shuffle volume collapses
    * to ~8k candidate rows per group. */
  private def probeKmv(spark: SparkSession, rows: Long, hotFrac: Double,
                       cpus: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val k = 256
    val df = spark.range(0, rows, 1, cpus * 2).select(
      when(pmod(hash(col("id")), lit(1000)) < lit((hotFrac * 1000).toInt),
        lit("hot"))
        .otherwise(concat(lit("cold"),
          pmod(hash(col("id") * 7 + 3), lit(50L)))).as("source"),
      concat(lit("v"), col("id")).as("text"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"kmv-giant","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"k":$k}""")
    def checksum(res: DataFrame): Long =
      res.agg(sum(hash(col("source"), col("n_kept"), col("kmv_estimate"))))
        .head().getLong(0)
    val h = graft.functions.HashExpressions.fnv1a32(col("text"))
    val (refChk, _, _) = measure(spark, "kmv_window_full") {
      // the round-10 shape: full per-group sort of ALL distinct hashes
      val w = Window.partitionBy("source").orderBy("h")
      checksum(df.select(col("source"), h.as("h")).distinct()
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          max(when(col("rk") === k, col("h"))).as("kth"))
        .select(col("source"), col("n_kept"),
          round(when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit(k - 1.0) / (col("kth") / 4294967296.0)), 4)
            .as("kmv_estimate")))
    }
    val (fastChk, _, _) = measure(spark, "kmv_prefiltered") {
      checksum(Relational.kmvDistinctEstimate(df, "source", "text", k))
    }
    require(refChk == fastChk,
      s"prefiltered sketch diverged from the full-sort reference: " +
        s"$fastChk vs $refChk")
    println(s"""{"probe":"kmv-giant","checksum":$fastChk,"match":true}""")

    // MANY-GROUPS regime (round-11 VERDICT item 1): one sketch per
    // ~unique key — the per-URL/per-user shape where a forced broadcast
    // of the one-row-per-group bounds frame dies at the driver. rows/8
    // groups × ~8 values each; broadcastGroupLimit = 1 forces EVERY
    // prefilter round onto the shuffle-hash path (the 10^9-group plan,
    // exercised at probe scale), and driver heap is sampled around the
    // run — the bounds frame must never be collected.
    val manyGroups = rows / 8
    val dfm = spark.range(0, rows, 1, cpus * 2).select(
      concat(lit("g"), pmod(hash(col("id")), lit(manyGroups))).as("source"),
      concat(lit("v"), col("id")).as("text"))
      .localCheckpoint(eager = true)
    val km = 8 // per-group sketches stay tiny; group COUNT is the load
    def checksumK(res: DataFrame): Long =
      res.agg(sum(hash(col("source"), col("n_kept"), col("kmv_estimate"))))
        .head().getLong(0)
    val rt = Runtime.getRuntime
    def heapMb(): Long = { System.gc(); (rt.totalMemory - rt.freeMemory) >> 20 }
    val heap0 = heapMb()
    val h2 = graft.functions.HashExpressions.fnv1a32(col("text"))
    val (shufChk, _, _) = measure(spark, "kmv_many_groups_shuffle_hash") {
      checksumK(Relational.kmvBottomK(dfm, "source", h2, km,
          broadcastGroupLimit = 1)
        .groupBy("g")
        .agg(count(lit(1)).as("n_kept"),
          max(when(col("rk") === km, col("h"))).as("kth"))
        .select(col("g").as("source"), col("n_kept"),
          round(when(col("n_kept") < km, col("n_kept").cast("double"))
            .otherwise(lit(km - 1.0) / (col("kth") / 4294967296.0)), 4)
            .as("kmv_estimate")))
    }
    val heap1 = heapMb()
    val (bcChk, _, _) = measure(spark, "kmv_many_groups_reference") {
      // the same sketch FORCED through the broadcast path (still fine
      // at probe scale) — equality pins the regime switch as a pure
      // plan property, invisible in the result
      checksumK(Relational.kmvBottomK(dfm, "source", h2, km,
          broadcastGroupLimit = Long.MaxValue)
        .groupBy("g")
        .agg(count(lit(1)).as("n_kept"),
          max(when(col("rk") === km, col("h"))).as("kth"))
        .select(col("g").as("source"), col("n_kept"),
          round(when(col("n_kept") < km, col("n_kept").cast("double"))
            .otherwise(lit(km - 1.0) / (col("kth") / 4294967296.0)), 4)
            .as("kmv_estimate")))
    }
    require(shufChk == bcChk,
      s"many-groups shuffle-hash sketch diverged: $shufChk vs $bcChk")
    println(s"""{"probe":"kmv-many-groups","groups":$manyGroups,""" +
      s""""checksum":$shufChk,"match":true,""" +
      s""""driver_heap_mb_before":$heap0,"driver_heap_mb_after":$heap1}""")
  }

  /** `--family unigram`: the hard-EM unigram tokenizer trainer at 1×
    * and 10× corpus over the SAME synthetic word population — after the
    * one corpus-counting pass, every EM round works on the word table,
    * so per-round wall must be flat in BOTH the round index and the
    * corpus size (the [[graft.text.Bpe]] scale contract, unigram
    * edition). The word population saturates well below 1× (20k forms),
    * so the 10× word TABLE is identical up to ~10× frequencies; the
    * probe asserts per-round walls stay in the same class at 10× and
    * REPORTS the trained piece-set overlap (report-only — exact
    * equality is not a theorem: the +1 smoothing is deliberately not
    * scale-covariant, so boundary pieces near the prune cut may flip
    * rank, and the two corpora are independent hash draws). */
  private def probeUnigram(spark: SparkSession, rows: Long,
                           cpus: Int): Unit = {
    def corpus(n: Long) = spark.range(0, n, 1, cpus * 2).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(2000L)),
          lit("x"), pmod(hash(col("id") * 7 + j * 13), lit(10L)))): _*)
        .as("text"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"unigram","rows":$rows,"cpus":$cpus}""")
    def run(label: String, docs: DataFrame): (Set[String], List[Long]) = {
      var pieces = Set.empty[String]
      val (_, _, _) = measure(spark, s"unigram_$label") {
        val (vocab, _) = graft.text.UnigramTokenizer.train(docs)
        val rows = vocab.select("piece").collect() // model-sized (≤ ~400)
        pieces = rows.map(_.getString(0)).toSet
        rows.length.toLong
      }
      val walls = graft.text.UnigramTokenizer.lastRoundWallsMs
      println(s"""{"probe":"unigram","form":"$label",""" +
        s""""pieces":${pieces.size},""" +
        s""""round_walls_ms":${walls.mkString("[", ",", "]")}}""")
      (pieces, walls)
    }
    val (v1, w1) = run("x1", corpus(rows))
    val (v10, w10) = run("x10", corpus(rows * 10))
    // structural invariants: same vocab SIZE (singles + pruned multis is
    // shape-determined) and the same single-char alphabet; multi-char
    // membership is only REPORTED — the two corpora are independent
    // hash draws, so word frequencies fluctuate binomially and pieces
    // near the prune cut legitimately churn
    require(v1.size == v10.size,
      s"vocab size changed with corpus size: ${v1.size} vs ${v10.size}")
    require(v1.filter(_.length == 1) == v10.filter(_.length == 1),
      "single-char coverage diverged between 1x and 10x")
    require(w10.sum <= 3 * w1.sum,
      s"EM rounds not flat in corpus size: ${w1.sum} ms -> ${w10.sum} ms")
    val overlap = (v1 intersect v10).size.toDouble / math.max(v1.size, 1)
    println(f"""{"probe":"unigram","overlap":$overlap%.4f,"flat":true}""")
  }

  /** `--family screen`: the growing-screen STATE BOUND, measured —
    * `rows` incoming docs arrive as 10 micro-batches, every consecutive
    * id pair sharing a unique text (each pair its own dup cluster, so
    * buckets stay tiny and the pair set is exactly rows/2). The
    * unbounded screen (st14's shape) must hold every bucket forever —
    * state rows grow ~bands·rows/2·(pair-unique buckets); the
    * watermarked screen (st15's shape, horizon = rows/20 s on a
    * 1 s/doc clock = half a micro-batch) expires buckets as the
    * watermark passes, so max state plateaus at the horizon+delay
    * window. Both runs must emit the IDENTICAL pair set — every pair
    * is 1 s apart, far inside the horizon — so the state bound is a
    * pure retention property, invisible in the answer. */
  private def probeScreenState(spark: SparkSession, rows: Long,
                               cpus: Int): Unit = {
    // per-pair text = 12 hash-derived words (unique-ish shingles per
    // cluster — a shared template would collide every band bucket into
    // one giant key and probe the refusal path, not the state bound)
    val pairKey = floor(col("id") / 2).cast("long")
    def mkIncoming(n: Long) = spark.range(0, n, 1, cpus * 2).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), pmod(hash(pairKey * 31 + j), lit(100000L)))): _*)
        .as("text"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("ts"))
      .localCheckpoint(eager = true)
    val incoming = mkIncoming(rows)
    val corpus = spark.range(0, 8).select(
      (col("id") + 1000000000L).as("doc_id"),
      concat(lit("static corpus filler document number "), col("id"),
        lit(" sharing nothing with any incoming pair at all")).as("text"))
      .localCheckpoint(eager = true)
    println(s"""{"probe":"screen-state","rows":$rows,"cpus":$cpus}""")
    def run(label: String)(body: => Long): (Long, Long) = {
      var pairs = 0L
      measure(spark, label) { pairs = body; pairs }
      (pairs, graft.streaming.EventStreams.lastMaxStateRows)
    }
    val (pu, su) = run("screen_unbounded") {
      graft.streaming.CorpusStreams.growingNearDupScreen(spark,
        incoming.drop("ts"), corpus, reproducible = true, tau = 0.5,
        inputFiles = 10).count()
    }
    println(s"""{"probe":"screen-state","form":"unbounded","pairs":$pu,""" +
      s""""max_state_rows":$su}""")
    val (pw, sw) = run("screen_watermarked") {
      graft.streaming.CorpusStreams.growingNearDupScreenWatermarked(spark,
        incoming, corpus, horizonSeconds = math.max(4L, rows / 20),
        watermarkDelay = "60 seconds", reproducible = true, tau = 0.5,
        inputFiles = 10).count()
    }
    println(s"""{"probe":"screen-state","form":"watermarked","pairs":$pw,""" +
      s""""max_state_rows":$sw}""")
    require(pu == pw && pu == rows / 2,
      s"screens diverged: unbounded=$pu watermarked=$pw expected=${rows / 2}")
    require(sw < su,
      s"watermarked state ($sw) did not undercut unbounded state ($su)")
    // the LONG-HORIZON shape: same arrival rate (docs per micro-batch
    // constant → 10x the micro-batches), same horizon seconds, 10x the
    // corpus length. Once state plateaus at arrival-rate x
    // (horizon + delay), max state must be FLAT in corpus length —
    // previously inferred from the single point above, now measured.
    // 100+ micro-batches also exercises the listener-accumulated state
    // census past recentProgress's 100-entry cap.
    val (p10, s10) = run("screen_watermarked_10x") {
      graft.streaming.CorpusStreams.growingNearDupScreenWatermarked(spark,
        mkIncoming(rows * 10), corpus,
        horizonSeconds = math.max(4L, rows / 20),
        watermarkDelay = "60 seconds", reproducible = true, tau = 0.5,
        inputFiles = 100).count()
    }
    println(s"""{"probe":"screen-state","form":"watermarked_10x","pairs":$p10,""" +
      s""""max_state_rows":$s10}""")
    require(p10 == rows * 10 / 2,
      s"10x screen lost pairs: $p10 vs ${rows * 10 / 2}")
    require(s10 < 2 * sw,
      s"watermarked state grew with corpus length: 10x=$s10 vs 1x=$sw")
  }

  /** `--family semdedup`: the single-assignment recall gap, measured —
    * `hotFrac` of vectors are planted BOUNDARY PAIRS (consecutive ids
    * 16° apart, symmetric about the 45° line between two anchor
    * clusters, cosine ≈ 0.961 ≥ τ = 0.95), so a coarse quantizer that
    * splits the 45° region leaves single-assignment blind to exactly
    * those pairs. Asserts the multi-probe removal set is a SUPERSET of
    * the single-assignment set and reports both counts + walls — the
    * recall/cost trade SCALE.md documents. */
  private def probeSemDedup(spark: SparkSession, rows: Long, hotFrac: Double,
                            cpus: Int): Unit = {
    // hotness keys on id/2 so a planted pair (2k, 2k+1) is hot
    // TOGETHER: member 2k is a random direction, member 2k+1 the same
    // direction plus a ±0.05 per-dim perturbation (cos ≈ 0.999 ≥ τ).
    // Pairs sit at MUTUALLY RANDOM directions, so each pair is its own
    // isolated dup group and the single-assignment pass misses exactly
    // the pairs the quantizer splits across a Voronoi boundary — the
    // NATURAL miss rate of the method, which multi-probe must recover.
    // 16-d: random cosines concentrate near 0 (P(cos ≥ .95) ≈ 4e-7),
    // so accidental dups are ~zero and recall is readable from counts;
    // in 4-d the same fixture drowns in ~0.5% accidental pairs.
    val dim = 16
    // NOTE col("id") / 2 is DOUBLE division in Spark — pair keying
    // must use integer floor division or the two members hash apart
    val pairKey = floor(col("id") / 2).cast("long")
    val isHot =
      pmod(hash(pairKey * 7 + 1), lit(1000)) < lit((hotFrac * 1000).toInt)
    def rand(mult: Int, off: Int, scale: Double, keyed: org.apache.spark.sql.Column) =
      (pmod(hash(keyed * mult + off), lit(2000L)).cast("double") - 1000.0) / scale
    val hotArr = array((0 until dim).map(j =>
      rand(37 + j, 11, 1000.0, pairKey) +
        when(col("id") % 2 === 1, rand(53 + j, 29, 20000.0, pairKey))
          .otherwise(lit(0.0))): _*)
    val coldArr = array((0 until dim).map(j =>
      rand(19 + j, 7, 1000.0, col("id"))): _*)
    val emb = spark.range(0, rows, 1, cpus * 2).select(
      col("id").as("vec_id"),
      when(isHot, hotArr).otherwise(coldArr).as("embedding"))
      .localCheckpoint(eager = true)
    val planted = emb.filter(
      pmod(hash(floor(col("vec_id") / 2).cast("long") * 7 + 1), lit(1000))
        < lit((hotFrac * 1000).toInt) && col("vec_id") % 2 === 1).count()
    // cells must stay bounded as N grows — nlist is the method's scale
    // knob (SemDedup's paper runs ~100k cells over 5B vectors)
    val nlist = math.max(8, (rows / 2500).toInt)
    println(s"""{"probe":"semdedup-boundary","rows":$rows,"hot_frac":$hotFrac,""" +
      s""""cpus":$cpus,"nlist":$nlist,"planted_pairs":$planted}""")
    var single: DataFrame = null
    var multi: DataFrame = null
    measure(spark, "semdedup_single") {
      single = SemDedup.removals(emb, tau = 0.95, nlist = nlist)
      single.count()
    }
    measure(spark, "semdedup_multiprobe") {
      multi = SemDedup.removalsMultiProbe(emb, tau = 0.95, nlist = nlist,
        nprobe = 2)
      multi.count()
    }
    val lost = single.select("removed_id")
      .join(multi.select("removed_id"), Seq("removed_id"), "left_anti")
      .count()
    require(lost == 0, s"multi-probe lost $lost single-assignment removals")
    println(s"""{"probe":"semdedup-boundary","planted_pairs":$planted,""" +
      s""""single_removed":${single.count()},""" +
      s""""multi_removed":${multi.count()}}""")
  }
}

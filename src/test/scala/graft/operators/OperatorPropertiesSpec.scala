package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.dedup.{Dedup, DupGroups}

/** Distributed operators vs. straightforward single-machine references on
  * random inputs: the distributed formulation (union+window as-of, label
  * propagation, first-occurrence election) must be EXACTLY the naive
  * semantics, independent of partitioning. */
class OperatorPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forSeeds[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  private val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  test("as-of join (both directions) equals the naive per-row scan") {
    val genEvents = Gen.listOfN(40, for {
      key <- Gen.choose(0, 3)
      tsOff <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0.0, 100.0)
      isLeft <- Gen.oneOf(true, false)
    } yield (key, tsOff, v, isLeft))
    forSeeds(genEvents) { evs =>
      val rows = evs.zipWithIndex.map { case ((k, t, v, l), i) =>
        (i.toLong, k.toString, new Timestamp(epoch + t * 1000), v, l)
      }
      val left = rows.filter(_._5).map(r => (r._1, r._2, r._3, r._4))
        .toDF("event_id", "key", "ts", "x")
      val right = rows.filterNot(_._5).map(r => (r._1, r._2, r._3, r._4))
        .toDF("event_id", "key", "ts", "v")

      val back = AsOfJoin.asOf(left, right, "key", "ts", "event_id", Seq("v"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
      val fwd = AsOfJoin.asOfForward(left, right, "key", "ts", "event_id", Seq("v"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asofnext_v")).map(_.toDouble)).toMap

      val rights = rows.filterNot(_._5)
      rows.filter(_._5).foreach { l =>
        val naiveBack = rights.filter(r => r._2 == l._2 && !r._3.after(l._3))
          .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._4)
        val naiveFwd = rights.filter(r => r._2 == l._2 && !r._3.before(l._3))
          .sortBy(r => (r._3.getTime, r._1)).headOption.map(_._4)
        assert(back(l._1) == naiveBack, s"backward mismatch for ${l._1}")
        assert(fwd(l._1) == naiveFwd, s"forward mismatch for ${l._1}")
      }
    }
  }

  test("connected components equal a driver-side union-find") {
    val genGraph = for {
      n <- Gen.choose(5, 25)
      m <- Gen.choose(0, 30)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n.toLong, edges.filter(e => e._1 != e._2))
    forSeeds(genGraph) { case (n, edges) =>
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap

      val got = DupGroups.connectedComponents(
          edges.toDF("a", "b"), (0L until n).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("segment strip equals the naive first-occurrence election") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val genDocs = Gen.listOfN(6, Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, word)))
    val width = 2
    forSeeds(genDocs) { docLists =>
      val docs = docLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "s0") }
        .toDF("doc_id", "text", "lang", "source")

      // naive: chunk, elect first (doc_id, idx) per segment value, reassemble
      val chunks = docLists.zipWithIndex.flatMap { case (ws, i) =>
        ws.grouped(width).zipWithIndex.map { case (seg, j) =>
          (i.toLong, j, seg.mkString(" "))
        }
      }
      val firsts = chunks.groupBy(_._3).map { case (seg, occ) =>
        seg -> occ.minBy(o => (o._1, o._2))
      }
      val expected = chunks
        .filter(c => firsts(c._3) == c)
        .groupBy(_._1)
        .map { case (id, segs) => id -> segs.sortBy(_._2).map(_._3).mkString(" ") }

      val got = Dedup.stripDuplicateSegments(docs, width)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"docs were ${docLists.map(_.mkString(" "))}")
    }
  }

  test("approx percentile (scale path) tracks the exact median within bound") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val both = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx"))
      .collect()
    both.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      // rank-error accuracy 1000 => well under 1% value error on this data
      assert(math.abs(a - e) <= math.max(0.01 * math.abs(e), 1e-6),
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("heavy-hitter sketch never misses a planted frequent item") {
    val genTail = Gen.listOfN(80, Gen.choose(100, 10000))
    forSeeds(genTail) { tail =>
      // plant an item at 20% frequency; sketch at support 0.1
      val planted = List.fill(20)(7)
      val df = (planted ++ tail).toDF("k")
      val hits = Relational.heavyHitters(df, "k", support = 0.1)
        .head().getSeq[Int](0)
      assert(hits.contains(7), s"sketch $hits lost the planted heavy hitter")
    }
  }

  test("funnel invariants: converted never exceeds cohort, cohorts partition clickers") {
    val genEvents = Gen.listOfN(60, for {
      user <- Gen.choose(0L, 9L)
      tsOff <- Gen.choose(0L, 72L * 3600)
      typ <- Gen.oneOf("click", "purchase", "view")
    } yield (user, tsOff, typ))
    forSeeds(genEvents) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t, ty), i) =>
        (i.toLong, new Timestamp(epoch + t * 1000), u, ty, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = Windows.conversionFunnel(df).collect()
      out.foreach { r =>
        assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      }
      val clickers = evs.filter(_._3 == "click").map(_._1).distinct.size
      assert(out.map(_.getAs[Long]("n_users")).sum == clickers)
    }
  }

  test("hashSample: deterministic, partition-independent, key-consistent") {
    val keys = (1L to 500L)
    val t1 = keys.map(k => (k, s"a$k")).toDF("user_id", "payload")
    val sampled = Relational.hashSample(t1, "user_id", 10)
      .select("user_id").as[Long].collect().toSet
    // partition-independent: same keep set at any parallelism
    val re = Relational.hashSample(t1.repartition(7), "user_id", 10)
      .select("user_id").as[Long].collect().toSet
    assert(sampled == re)
    // key-consistent across tables: a second table with other payloads
    // keeps exactly the same user_ids (sample users, not rows)
    val t2 = keys.map(k => (k, k * 2.0)).toDF("user_id", "other")
    val s2 = Relational.hashSample(t2, "user_id", 10)
      .select("user_id").as[Long].collect().toSet
    assert(sampled == s2)
    // monotone in pct: the 10% sample is a subset of the 20% sample
    val s20 = Relational.hashSample(t1, "user_id", 20)
      .select("user_id").as[Long].collect().toSet
    assert(sampled.subsetOf(s20))
    // rough size sanity (FNV over ~uniform keys): 10% ± wide slack
    assert(sampled.size > 20 && sampled.size < 130)
  }

  test("chunked as-of join equals plain as-of on chunk-crossing histories") {
    // ts spread over ~4 days with 1h chunks: right values must carry
    // across many empty and non-empty chunks; null payloads exercise the
    // per-column ignoreNulls carry
    val genEvents = Gen.listOfN(80, for {
      key <- Gen.choose(0, 3)
      tsOff <- Gen.choose(0L, 4L * 24 * 3600)
      v <- Gen.option(Gen.choose(0.0, 100.0))
      isLeft <- Gen.oneOf(true, false)
    } yield (key, tsOff, v, isLeft))
    forSeeds(genEvents) { evs =>
      val rows = evs.zipWithIndex.map { case ((k, t, v, l), i) =>
        (i.toLong, k.toString, new Timestamp(epoch + t * 1000), v, l)
      }
      val left = rows.filter(_._5).map(r => (r._1, r._2, r._3))
        .toDF("event_id", "key", "ts")
      val right = rows.filterNot(_._5).map(r => (r._1, r._2, r._3, r._4))
        .toDF("event_id", "key", "ts", "v")
      def result(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
      val plain = result(
        AsOfJoin.asOf(left, right, "key", "ts", "event_id", Seq("v")))
      val chunked = result(AsOfJoin.asOfChunked(
        left, right, "key", "ts", "event_id", Seq("v"), chunkHours = 1))
      assert(chunked == plain)
      // forward direction, same histories: chunked ≡ plain
      def fwdResult(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("asofnext_v")).map(_.toDouble)).toMap
      val fwdPlain = fwdResult(
        AsOfJoin.asOfForward(left, right, "key", "ts", "event_id", Seq("v")))
      val fwdChunked = fwdResult(AsOfJoin.asOfForwardChunked(
        left, right, "key", "ts", "event_id", Seq("v"), chunkHours = 1))
      assert(fwdChunked == fwdPlain)
    }
  }

  test("chunked sessionize equals plain sessionize and the naive fold") {
    // gap 30 min, chunks 1 h over ~5 days of minute-resolution events:
    // plenty of sessions split across chunk boundaries for the merge
    // pass to rejoin, plus duplicate timestamps from generator collisions
    val genEvents = Gen.listOfN(300, for {
      user <- Gen.choose(0L, 5L)
      tOff <- Gen.choose(0L, 5L * 24 * 60)
    } yield (user, tOff))
    forSeeds(genEvents) { evs =>
      // ids assigned in (user, time) order so sessionize's event_id
      // ordering and sessionizeChunked's ts ordering agree
      val rows = evs.sortBy(e => (e._1, e._2)).zipWithIndex.map {
        case ((u, t), i) =>
          (i.toLong, u, new Timestamp(epoch + t * 60000L), "click", 1.0)
      }
      val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      def toMap(a: Array[org.apache.spark.sql.Row]) = a.map(r =>
        r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_sessions"),
          r.getAs[Double]("avg_session_events"),
          r.getAs[Long]("max_session_events")))).toMap
      val plain = toMap(Windows.sessionize(df, 30).collect())
      val chunked = toMap(Windows.sessionizeChunked(df, 30, chunkHours = 1).collect())
      assert(chunked == plain)
      // and both equal the naive per-user fold
      rows.groupBy(_._2).foreach { case (u, rs) =>
        val times = rs.map(_._3.getTime).sorted
        val sessions = scala.collection.mutable.ArrayBuffer.empty[Long]
        var cnt = 0L; var last = Long.MinValue
        times.foreach { t =>
          if (cnt > 0 && t - last > 30 * 60000L) { sessions += cnt; cnt = 0 }
          cnt += 1; last = t
        }
        if (cnt > 0) sessions += cnt
        val (n, a, m) = chunked(u)
        assert(n == sessions.length.toLong, s"n_sessions for user $u")
        assert(math.abs(a - sessions.sum.toDouble / sessions.length) < 5e-5,
          s"avg_session_events for user $u")
        assert(m == sessions.max, s"max_session_events for user $u")
      }
    }
  }

  test("chunked sessionize: one continuous session across many chunk boundaries") {
    // events every 10 min for 6 h: crosses five 1h-chunk boundaries but
    // never exceeds the 30 min gap -> exactly one merged session; an
    // exactly-at-gap pair (strict >) must also NOT split
    val rows = (0 until 37).map(i =>
      (i.toLong, 1L, new Timestamp(epoch + i * 10 * 60000L), "click", 1.0)) :+
      ((99L, 2L, new Timestamp(epoch), "click", 1.0)) :+
      ((100L, 2L, new Timestamp(epoch + 30 * 60000L), "click", 1.0))
    val out = Windows.sessionizeChunked(
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"),
      30, chunkHours = 1).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("max_session_events")))).toMap
    assert(out(1L) == ((1L, 37L)))
    assert(out(2L) == ((1L, 2L)))
  }

  test("stratifiedHashSample: per-stratum rates, consistent with hashSample") {
    val t = (1L to 600L).map(k =>
      (k, if (k % 3 == 0) "a" else if (k % 3 == 1) "b" else "c"))
      .toDF("user_id", "stratum")
    val out = Relational.stratifiedHashSample(t, "user_id", "stratum",
      Map("a" -> 100, "b" -> 10), defaultPct = 0)
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 100% stratum keeps everything, 0% default drops all of c
    assert(byStratum("a") == 200L)
    assert(!byStratum.contains("c"))
    assert(byStratum("b") > 2 && byStratum("b") < 50)
    // a stratum sampled at pct p keeps exactly hashSample(p)'s keys —
    // the same cross-table key consistency contract
    val bKeys = out.filter($"stratum" === "b")
      .select("user_id").as[Long].collect().toSet
    val flat = Relational.hashSample(t.filter($"stratum" === "b"), "user_id", 10)
      .select("user_id").as[Long].collect().toSet
    assert(bKeys == flat)
  }

  test("distributionBalance matches hand-computed entropy/HHI") {
    // group g: 3 cats with counts 2/2/4 (N=8) -> H = ln8 - (2ln2+2ln2+4ln4)/8
    // group u: uniform 2 cats -> norm_entropy = 1; group s: single cat
    val df = (Seq.fill(2)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c"))
      .map(("g", _)) ++ Seq(("u", "a"), ("u", "b"), ("s", "only"))
    val out = Relational.distributionBalance(
        df.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val hG = math.log(8) - (2 * math.log(2) * 2 + 4 * math.log(4)) / 8.0
    assert(out("g")._1 == 8L && out("g")._2 == 3L)
    assert(math.abs(out("g")._3 - hG) < 1e-6)
    assert(math.abs(out("g")._5 - (4 + 4 + 16) / 64.0) < 1e-6)
    assert(math.abs(out("u")._4 - 1.0) < 1e-6)
    assert(out("s")._4 == 1.0 && out("s")._5 == 1.0)
  }
}

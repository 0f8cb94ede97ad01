package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.graph.Bfs

/** Value-level pins for the round-8 additions that aren't covered by an
  * existing operator spec: prefix-filter similarity join, bounded BFS,
  * grouped 2-feature ridge, streaks. */
class NewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("prefixFilterPairs finds exactly the pairs >= tau (vs brute force)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // last-word edit of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),  // exact dup of 1
      (4L, "one two three four five six seven eight"),
      (5L, "completely different words with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, tau = 0.5, shingleK = 5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // brute force on 5-shingle sets
    def sh(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val texts = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "one two three four five six seven eight",
      5L -> "completely different words with no overlap at all")
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      j = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size
      if j >= 0.5
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.nonEmpty)
  }

  test("bfs hop distances equal the naive layered expansion") {
    // 0->1->2->3->4 chain plus shortcut 0->3 and unreachable 9->10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L),
      (9L, 10L)).toDF("src", "dst")
    val got = Bfs.hopDistances(edges, Seq(0L).toDF("node"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
    // maxHops truncates
    val got1 = Bfs.hopDistances(edges, Seq(0L).toDF("node"), maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(got1 == Map(0L -> 0, 1L -> 1, 3L -> 1))
  }

  test("groupedRidge2 recovers a planted linear model") {
    // y = 3*x1 - 2*x2 + 7, exact; ridge 1e-6 perturbs ~1e-6 only
    val rows = for (i <- 1 to 50) yield
      ("g", i.toDouble, (i % 7).toDouble, 3.0 * i - 2.0 * (i % 7) + 7.0)
    val out = Relational.groupedRidge2(
        rows.toDF("grp", "x1", "x2", "y"), "grp",
        col("x1"), col("x2"), col("y"))
      .as[(String, Long, Double, Double, Double)].head()
    assert(math.abs(out._3 - 3.0) < 1e-3 && math.abs(out._4 + 2.0) < 1e-3
      && math.abs(out._5 - 7.0) < 1e-2, out)
  }

  test("haversine and nearest-station assignment on known geometry") {
    // 1 degree of latitude ~ 111.19 km; same point -> 0
    val pts = Seq((1L, 0.0, 0.0), (2L, 10.0, 20.0)).toDF("point_id", "lat", "lon")
    val st = Seq((1L, 1.0, 0.0), (2L, 10.0, 21.0), (3L, -50.0, 100.0))
      .toDF("station_id", "s_lat", "s_lon")
    val prof = Geo.nearestStationProfile(pts, st)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // point 1 -> station 1 (111.19 km); point 2 -> station 2 (~109.5 km)
    assert(prof.keySet == Set(1L, 2L))
    assert(prof(1L)._1 == 1L && math.abs(prof(1L)._2 - 111.19) < 0.1, prof)
    val d0 = spark.range(1).select(Geo.haversineKm(lit(42.0), lit(7.0),
      lit(42.0), lit(7.0))).head().getDouble(0)
    assert(d0 == 0.0)
  }

  test("grid-band escalation reproduces the broadcast nearest-station " +
    "profile exactly, including far-from-any-station points") {
    // stations clustered near the equator + one polar outlier: points at
    // high latitude need several ring doublings before their bound
    // certifies the argmin — the escalation path, not just ring 1
    val pts = (0L until 400L).map(i =>
      (i, (i * 37 % 171).toDouble - 85.0 + 0.3, (i * 91 % 360).toDouble - 180.0 + 0.7))
      .toDF("point_id", "lat", "lon")
    val st = Seq((0L, 1.0, 10.0), (1L, -3.0, 160.0), (2L, 4.5, -100.0),
      (3L, 82.0, 55.0)).toDF("station_id", "s_lat", "s_lon")
    val broad = Geo.nearestStationProfile(pts, st).collect().toSeq
    val grid = Geo.nearestStationProfileGrid(pts, st, bandDeg = 10.0)
      .collect().toSeq
    assert(grid == broad, s"grid:\n$grid\nbroadcast:\n$broad")
    // narrow bands force the deepest escalation (maxRadius rounds)
    val grid2 = Geo.nearestStationProfileGrid(pts, st, bandDeg = 2.5)
      .collect().toSeq
    assert(grid2 == broad)
    // empty catalog: both forms yield an empty profile
    assert(Geo.nearestStationProfileGrid(pts, st.limit(0)).isEmpty)
  }

  test("weightedMedian and equi-depth histogram on a hand computed frame") {
    // values 1..4 with weights 1,1,1,5: total 8, half 4 -> cw hits 4 at
    // value 4? cw: 1,2,3,8 -> first cw>=4 is value 4
    val li = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 5.0))
      .zipWithIndex.map { case ((v, w), i) => ("A", v, w, i.toLong, i) }
      .toDF("l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber")
    val wm = Relational.weightedMedian(li, "l_returnflag",
      "l_extendedprice", "l_quantity").head()
    assert(wm.getDouble(1) == 4.0, wm)
    val hist = Relational.equiDepthHistogram(li, buckets = 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(hist(1) == ((2L, 1.0, 2.0)) && hist(2) == ((2L, 3.0, 4.0)), hist)
  }

  test("modeByGroup picks the most frequent value, smallest on ties") {
    val df = Seq(("g", 3.0), ("g", 3.0), ("g", 1.0), ("g", 1.0), ("g", 2.0),
      ("h", 9.0)).toDF("grp", "v")
    val rows = Relational.modeByGroup(df, "grp", "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("g") == ((1.0, 2L, 3L)), rows) // tie 1.0 vs 3.0 -> smallest
    assert(rows("h") == ((9.0, 1L, 1L)))
  }

  test("paretoShare: top decile carries the top keys' mass") {
    // 10 keys with values 10,9,...,1 -> total 55; decile i holds key i
    val df = (1 to 10).flatMap(k => Seq.fill(2)((k.toLong, (11 - k) * 0.5)))
      .toDF("k", "v")
    val rows = Relational.paretoShare(df, "k", "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == (1 to 10).toSet)
    // cum_share is rounded to 6 decimals by the operator
    assert(rows(1)._1 == 1L && math.abs(rows(1)._2 - 10.0 / 55.0) < 5e-7)
    assert(math.abs(rows(10)._2 - 1.0) < 5e-7)
  }

  test("corrMatrix emits every pair once with exact correlations") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i + 1, 21.0 - i))
      .toDF("a", "b", "c")
    val rows = graft.operators.Profile.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(rows.size == 3)
    assert(rows(("a", "b")) == 1.0 && rows(("a", "c")) == -1.0
      && rows(("b", "c")) == -1.0)
  }

  test("activityStreaks: longest run and streak count per user") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // user 7: days 1,2,3, 5,6, 9 -> streaks 3,2,1; user 8: day 4 only
    val events = Seq((7L, ts(1)), (7L, ts(2)), (7L, ts(2)), (7L, ts(3)),
      (7L, ts(5)), (7L, ts(6)), (7L, ts(9)), (8L, ts(4)))
      .toDF("user_id", "ts")
    val rows = graft.operators.Windows.activityStreaks(events)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(7L) == ((6L, 3L, 3L)), rows)
    assert(rows(8L) == ((1L, 1L, 1L)), rows)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(5.0), "a"), (2L, Some(50.0), "b"), (3L, None, "a"),
    (4L, Some(-1.0), "zz"), (4L, Some(200.0), "a"))
    .toDF("id", "v", "tag")

  test("every rule type counts its violations in one report") {
    val out = Quality.check(df, Seq(
      Quality.NotNull("v"),
      Quality.InRange("v", 0.0, 100.0),
      Quality.InSet("tag", Seq("a", "b")),
      Quality.Unique(Seq("id")),
      Quality.Satisfies("v_even_id", col("id") % 2 === 0 || col("v") > 0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null(v)") == ((5L, 1L, false)))
    assert(out("in_range(v,0.0,100.0)") == ((5L, 2L, false))) // -1, 200
    assert(out("in_set(tag)") == ((5L, 1L, false))) // zz
    assert(out("unique(id)") == ((5L, 1L, false))) // dup id 4
    // id=3 (odd) has null v -> null predicate passes; id=4 even passes
    assert(out("satisfies(v_even_id)") == ((5L, 0L, true)))
  }

  test("clean data passes; empty frame passes vacuously") {
    val clean = Quality.check(df.filter(col("id") < 3), Seq(
      Quality.NotNull("v"), Quality.Unique(Seq("id"))))
      .collect()
    assert(clean.forall(_.getBoolean(3)))
    val empty = Quality.check(df.filter(lit(false)), Seq(Quality.NotNull("v")))
      .collect()
    assert(empty.length == 1 && empty.head.getBoolean(3))
  }

  test("approx uniqueness passes within sketch noise and fails real duplication") {
    // 10k unique ids: exact violations 0; HLL estimate is within 3·rsd
    // noise of 10k, so the contract-gated verdict must PASS
    val unique = (1L to 10000L).toDF("id")
    val u = Quality.check(unique, Seq(
      Quality.Unique(Seq("id")), Quality.UniqueApprox(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(u("unique(id)") && u("unique_approx(id)"))
    // every id duplicated 4x: 75% violation rate is far beyond the 15%
    // contract slack — both forms must FAIL
    val dup = (1L to 10000L).map(_ % 2500).toDF("id")
    val d = Quality.check(dup, Seq(
      Quality.Unique(Seq("id")), Quality.UniqueApprox(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!d("unique(id)") && !d("unique_approx(id)"))
    // plan shape, the point of the twin: exact uniqueness keeps a
    // distinct aggregate (shuffles every distinct tuple; TWO exact rules
    // on different keys additionally Expand via the multi-distinct
    // rewrite), while any number of approx rules stay plain HLL
    // aggregates — no distinct, no Expand, constant reducer state
    val two = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    def planOf(rules: Seq[Quality.Rule]) =
      Quality.check(two, rules).queryExecution.executedPlan.toString
    val approxPlan = planOf(Seq(
      Quality.UniqueApprox(Seq("id")), Quality.UniqueApprox(Seq("tag"))))
    assert(approxPlan.indexOf("Expand") < 0)
    assert(approxPlan.indexOf("approx_count_distinct") >= 0)
    assert(approxPlan.indexOf("count(distinct") < 0)
    assert(planOf(Seq(
      Quality.Unique(Seq("id")), Quality.Unique(Seq("tag"))))
      .indexOf("Expand") >= 0)
  }

  test("duplicate rule names and empty rule sets are rejected") {
    intercept[IllegalArgumentException] {
      Quality.check(df, Seq(Quality.NotNull("v"), Quality.NotNull("v")))
    }
    intercept[IllegalArgumentException] { Quality.check(df, Seq.empty) }
  }

  test("quarantine routes violators with labels and keeps good rows clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q_route")
    try {
      val data = Seq(
        (1L, Some(5.0)),              // good
        (2L, None),                   // fails not_null
        (3L, Some(999.0)),            // fails in_range
        (4L, Some(10.0)))             // good
        .toDF("id", "v")
      val rules = Seq(Quality.NotNull("v"), Quality.InRange("v", 0.0, 100.0))
      val (nGood, nBad) =
        Quality.quarantine(data, rules, s"$dir/good", s"$dir/bad")
      assert((nGood, nBad) == ((2L, 2L)))
      val good = spark.read.parquet(s"$dir/good")
      assert(!good.columns.contains("_failed_rules"))
      assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 4L))
      val bad = spark.read.parquet(s"$dir/bad")
        .collect().map(r => r.getAs[Long]("id") ->
          r.getAs[String]("_failed_rules")).toMap
      assert(bad(2L) == "not_null(v)")
      assert(bad(3L) == "in_range(v,0.0,100.0)")
      // aggregate-level rules cannot route rows
      intercept[IllegalArgumentException] {
        Quality.withFailedRules(data, Seq(Quality.Unique(Seq("id"))))
      }
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("approxFds finds the exact FD and scores the leaky one") {
    // city → zip is exact (every city maps to one zip); zip → city is
    // broken once: zip 10 maps to cityA 3× and cityB 1× → (3+2)/6
    val df = Seq((1L, "cityA", 10L), (2L, "cityA", 10L), (3L, "cityA", 10L),
      (4L, "cityB", 10L), (5L, "cityC", 20L), (6L, "cityC", 20L))
      .toDF("id", "city", "zip")
    val r = Quality.approxFds(df, "id", Seq("city", "zip")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3))).toSeq
    assert(r == Seq(("city", "zip", 3L, 1.0),
      ("zip", "city", 2L, math.rint(5.0 / 6.0 * 1e6) / 1e6)))
  }

  test("approxFds is deterministic across partitionings") {
    val df = (1 to 400).map(k =>
      (k.toLong, s"c${k % 9}", (k % 9 / 3).toLong, s"s${k % 5}"))
      .toDF("id", "a", "b", "c")
    val cols = Seq("a", "b", "c")
    val x = Quality.approxFds(df, "id", cols).collect().toSeq
    val y = Quality.approxFds(df.repartition(21), "id", cols).collect().toSeq
    assert(x == y)
    // a → b is exact by construction (b = a's bucket)
    val ab = x.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getDouble(3) == 1.0)
  }
}

package graft.ml

import graft.SparkTestBase

class TheilSenSpec extends SparkTestBase {
  import spark.implicits._

  test("slope shrugs off an outlier that would drag OLS") {
    // four collinear points y = 2x plus one wild outlier: the median of
    // the 10 pairwise slopes is still exactly 2, residual median 0
    val pts = Seq(("g", 0.0, 0.0), ("g", 1.0, 2.0), ("g", 2.0, 4.0),
      ("g", 3.0, 6.0), ("g", 4.0, 100.0)).toDF("k", "x", "y")
    val r = TheilSen.slopeByGroup(pts, "k", "x", "y").collect().head
    assert(r.getAs[Long]("n_points") == 5)
    assert(r.getAs[Long]("n_pairs") == 10)
    assert(r.getAs[Double]("ts_slope") == 2.0)
    assert(r.getAs[Double]("ts_intercept") == 0.0)
  }

  test("exact line is recovered exactly, per group") {
    val pts = (for { g <- Seq("a", "b"); x <- 0 to 9 }
      yield (g, x.toDouble, if (g == "a") 3.0 * x + 1 else -0.5 * x + 4))
      .toDF("k", "x", "y")
    val rows = TheilSen.slopeByGroup(pts, "k", "x", "y")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("ts_slope"), r.getAs[Double]("ts_intercept"))).toMap
    assert(rows("a") == ((3.0, 1.0)))
    assert(rows("b") == ((-0.5, 4.0)))
  }

  test("result is invariant to partitioning") {
    val pts = (1 to 60).map(i => (s"g${i % 3}", (i / 3).toDouble + i % 3,
      math.cos(i * 0.7) * 10 + i * 0.5))
    val a = TheilSen.slopeByGroup(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().toSeq
    val b = TheilSen.slopeByGroup(
        scala.util.Random.shuffle(pts).toDF("k", "x", "y").repartition(11),
        "k", "x", "y")
      .collect().toSeq
    assert(a == b)
  }
}

package graft.ml

import graft.SparkTestBase

class MannKendallSpec extends SparkTestBase {
  import spark.implicits._

  test("strictly increasing series: S = n(n-1)/2, tau_b = 1") {
    val pts = (0 until 10).map(i => ("g", i.toDouble, i * 2.0 + 1))
      .toDF("k", "x", "y")
    val r = MannKendall.testByGroup(pts, "k", "x", "y").collect().head
    assert(r.getAs[Long]("n_points") == 10)
    assert(r.getAs[Long]("s_stat") == 45)     // all 45 pairs concordant
    // no ties: Var(S) = n(n−1)(2n+5)/18 = 10·9·25/18 = 125
    assert(r.getAs[Double]("var_s") == 125.0)
    assert(r.getAs[Double]("tau_b") == 1.0)
    val z = 44.0 / math.sqrt(125.0)
    assert(r.getAs[Double]("z") == math.rint(z * 1e6) / 1e6)
  }

  test("strictly decreasing series mirrors the sign") {
    val pts = (0 until 8).map(i => ("g", i.toDouble, -i * 3.0))
      .toDF("k", "x", "y")
    val r = MannKendall.testByGroup(pts, "k", "x", "y").collect().head
    assert(r.getAs[Long]("s_stat") == -28)
    assert(r.getAs[Double]("tau_b") == -1.0)
    assert(r.getAs[Double]("z") < 0)
  }

  test("ties shrink the variance by the correction term") {
    // y = 1,1,1,2,2 over x = 0..4: tie groups t=3 and t=2 →
    // tie_term = 3·2·11 + 2·1·9 = 84; var = (5·4·15 − 84)/18 = 12
    val pts = Seq(("g", 0.0, 1.0), ("g", 1.0, 1.0), ("g", 2.0, 1.0),
      ("g", 3.0, 2.0), ("g", 4.0, 2.0)).toDF("k", "x", "y")
    val r = MannKendall.testByGroup(pts, "k", "x", "y").collect().head
    // concordant pairs: each of the three 1s vs each of the two 2s = 6
    assert(r.getAs[Long]("s_stat") == 6)
    assert(r.getAs[Double]("var_s") == 12.0)
    // tau_b = 6 / (√10 · √(10 − (3 + 1))) — tied pairs 3·2/2 + 2·1/2 = 4
    val tau = 6.0 / (math.sqrt(10.0) * math.sqrt(6.0))
    assert(r.getAs[Double]("tau_b") == math.rint(tau * 1e6) / 1e6)
  }

  test("no-trend noise gives |z| below significance, and partition invariance") {
    val pts = (0 until 40).map(i =>
      ("g", i.toDouble, math.sin(i * 2.399963) * 10))
    val a = MannKendall.testByGroup(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().toSeq
    assert(math.abs(a.head.getAs[Double]("z")) < 1.96)
    val b = MannKendall.testByGroup(
      scala.util.Random.shuffle(pts).toDF("k", "x", "y").repartition(7),
      "k", "x", "y").collect().toSeq
    assert(a == b)
  }
}

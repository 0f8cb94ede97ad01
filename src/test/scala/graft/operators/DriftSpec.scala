package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("ksStatistic is exact on a hand-computable two-sample case") {
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A - F_B peaks at x=2 with 2/4 - 0
    val df = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val row = Drift.ksStatistic(df, "v", "g", "a", "b").collect().head
    assert(row.getAs[String]("group_a") == "a")
    assert(row.getAs[Long]("n_a") == 4L)
    assert(row.getAs[Long]("n_b") == 4L)
    assert(row.getAs[Double]("ks_stat") == 0.5)
  }

  test("ksStatistic is 0 for identical samples and ~1 for disjoint ones") {
    val same = (Seq.tabulate(50)(i => ("a", i)) ++ Seq.tabulate(50)(i => ("b", i)))
      .toDF("g", "v")
    assert(Drift.ksStatistic(same, "v", "g", "a", "b")
      .collect().head.getAs[Double]("ks_stat") == 0.0)
    val apart = (Seq.tabulate(20)(i => ("a", i)) ++
      Seq.tabulate(20)(i => ("b", i + 1000))).toDF("g", "v")
    assert(Drift.ksStatistic(apart, "v", "g", "a", "b")
      .collect().head.getAs[Double]("ks_stat") == 1.0)
  }

  test("ksStatistic ignores other groups and null values") {
    val df = Seq(("a", Some(1)), ("a", None), ("b", Some(1)),
      ("c", Some(999)), ("b", Some(2))).toDF("g", "v")
    val row = Drift.ksStatistic(df, "v", "g", "a", "b").collect().head
    assert(row.getAs[Long]("n_a") == 1L && row.getAs[Long]("n_b") == 2L)
    assert(row.getAs[Double]("ks_stat") == 0.5) // |1/1 - 2/2| at v=1 is 0; at v=1 F_A=1, F_B=0.5
  }

  test("psi is ~0 for an identical distribution and large for a shifted one") {
    val base = Seq.tabulate(200)(i => ("base", (i % 100).toDouble))
    val same = Seq.tabulate(200)(i => ("same", (i % 100).toDouble))
    val shifted = Seq.tabulate(200)(i => ("shift", (i % 100).toDouble / 10))
    val out = Drift.psi((base ++ same ++ shifted).toDF("g", "v"),
        "v", "g", "base", bins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("same")) < 1e-9)
    assert(out("shift") > 1.0) // concentrated in bin 0 vs uniform
    assert(!out.contains("base"))
  }

  test("psi completes empty bins via smoothing (no NaN/Inf)") {
    // comparison group occupies only one bin of the global range
    val df = (Seq.tabulate(100)(i => ("base", i.toDouble)) ++
      Seq.tabulate(50)(_ => ("narrow", 0.0))).toDF("g", "v")
    val v = Drift.psi(df, "v", "g", "base", bins = 8)
      .collect().head.getDouble(2)
    assert(!v.isNaN && !v.isInfinite && v > 0)
  }

  test("chiSquareIndependence matches the textbook 2x2 computation") {
    // table: (x,p)=30 (x,q)=10 / (y,p)=10 (y,q)=30; n=80, all e=20
    // chi2 = 4 * (10^2 / 20) = 20.0, dof = 1
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val r = Drift.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("n") == 80L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 20.0)
  }

  test("chiSquareIndependence counts zero-observed cells in the grid") {
    // (x,p)=5, (y,q)=5 and nothing else: e = 2.5 everywhere,
    // chi2 = 2*(2.5)^2/2.5 * 2 = 10.0 with the two empty cells included
    val rows = Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))
    val r = Drift.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Double]("chi2") == 10.0)
    assert(r.getAs[Long]("dof") == 1L)
  }

  test("mutualInformation: zero for independence, H for identical columns") {
    // independent: every (a,b) combo equally likely -> MI = 0
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 10)
      yield (a, b)).toDF("a", "b")
    val r0 = Drift.mutualInformation(indep, "a", "b").collect().head
    assert(r0.getAs[Double]("mi") == 0.0 && r0.getAs[Double]("nmi") == 0.0)
    // identical columns: MI = H(a) = H(b) = ln 2 for a fair binary, nmi = 1
    val ident = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val r1 = Drift.mutualInformation(ident, "a", "b").collect().head
    val ln2 = math.rint(math.log(2) * 1e6) / 1e6
    assert(r1.getAs[Double]("mi") == ln2)
    assert(r1.getAs[Double]("h_a") == ln2 && r1.getAs[Double]("h_b") == ln2)
    assert(r1.getAs[Double]("nmi") == 1.0)
    // degenerate single-value column: H = 0, nmi defined as 0
    val degen = Seq.fill(5)(("only", "p")).toDF("a", "b")
    val r2 = Drift.mutualInformation(degen, "a", "b").collect().head
    assert(r2.getAs[Double]("h_a") == 0.0 && r2.getAs[Double]("nmi") == 0.0)
  }

  test("ksStatistic survives single-partition and many-partition layouts") {
    val df = (Seq.tabulate(500)(i => ("a", i * 3 % 97)) ++
      Seq.tabulate(400)(i => ("b", i * 7 % 89))).toDF("g", "v")
    val one = Drift.ksStatistic(df.coalesce(1), "v", "g", "a", "b")
      .collect().head.getAs[Double]("ks_stat")
    val many = Drift.ksStatistic(df.repartition(16), "v", "g", "a", "b")
      .collect().head.getAs[Double]("ks_stat")
    assert(one == many)
  }
}

package graft.operators

import graft.SparkTestBase

class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("winsorizedStats clamps at the group's own exact quantiles") {
    // group g: values 1..9 plus a 1000 outlier; p0.05/p0.95 of
    // (1..9,1000) via linear interpolation: lo = 1 + 0.45*(2-1) = 1.45,
    // hi = 9 + 0.55*(1000-9) = 554.05 (quantile_cont semantics)
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val r = Relational.winsorizedStats(df, "grp", "v", 0.05, 0.95)
      .collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(math.abs(r.getAs[Double]("w_lo") - 1.45) < 1e-9)
    assert(math.abs(r.getAs[Double]("w_hi") - 554.05) < 1e-9)
    // robust mean pulled far below the raw mean by the clamped outlier
    assert(r.getAs[Double]("mean_winsorized") < r.getAs[Double]("mean_raw"))
    val expectedWinsMean =
      ((2 to 9).map(_.toDouble).sum + 1.45 + 554.05) / 10.0
    assert(math.abs(r.getAs[Double]("mean_winsorized")
      - math.rint(expectedWinsMean * 1e4) / 1e4) < 1e-9)
  }

  test("winsorizedStats bounds are per-group, not global") {
    val df = (Seq.tabulate(20)(i => ("small", (i + 1).toDouble)) ++
      Seq.tabulate(20)(i => ("big", (i + 1) * 1000.0))).toDF("grp", "v")
    val rows = Relational.winsorizedStats(df, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("w_hi")).toMap
    assert(rows("small") < 21.0 && rows("big") > 18000.0)
  }

  test("winsorizedStats contracts fail fast") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    intercept[IllegalArgumentException](
      Relational.winsorizedStats(df, "grp", "v", 0.9, 0.1))
    intercept[IllegalArgumentException](
      Relational.winsorizedStats(df, "grp", "v; drop table x", 0.1, 0.9))
  }
}

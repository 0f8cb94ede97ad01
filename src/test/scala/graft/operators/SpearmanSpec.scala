package graft.operators

import graft.SparkTestBase

class SpearmanSpec extends SparkTestBase {
  import spark.implicits._

  test("monotone nonlinear relation scores exactly 1; reversed scores -1") {
    val up = (1 to 50).map(i => ("up", i.toDouble, math.exp(i / 10.0)))
    val dn = (1 to 50).map(i => ("dn", i.toDouble, -math.exp(i / 10.0)))
    val r = Relational.spearmanByGroup((up ++ dn).toDF("g", "x", "y"),
        "g", "x", "y")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("up") == 1.0, s"monotone increasing: ${r("up")}")
    assert(r("dn") == -1.0, s"monotone decreasing: ${r("dn")}")
  }

  test("average ranks handle ties; all-tied column yields null") {
    // y has heavy ties (two levels); correlation still defined
    val df = ((1 to 20).map(i => ("g", i.toDouble, (i / 11).toDouble)) ++
      (1 to 9).map(i => ("flat", i.toDouble, 7.0))).toDF("g", "x", "y")
    val rows = Relational.spearmanByGroup(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("g").getDouble(2) > 0.5)
    assert(rows("flat").isNullAt(2), "zero rank variance must be null")
  }
}

package graft.operators

import graft.SparkTestBase

class RollingMedianSpec extends SparkTestBase {
  import spark.implicits._

  test("centered frame interpolates at edges and ignores other keys") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 10.0), ("a", 3L, 2.0), ("a", 4L, 100.0),
      ("b", 1L, 7.0)
    ).toDF("k", "i", "v")
    val got = Windows.rollingMedian(df, "k", Seq("i"), "v", radius = 1)
      .orderBy("k", "i").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    // a@1: {1,10} → 5.5; a@2: {1,10,2} → 2; a@3: {10,2,100} → 10;
    // a@4: {2,100} → 51; b is its own partition → 7
    assert(got.toSeq == Seq(("a", 1L, 5.5), ("a", 2L, 2.0),
      ("a", 3L, 10.0), ("a", 4L, 51.0), ("b", 1L, 7.0)))
  }

  test("median resists the spike the rolling mean chases") {
    val df = ((1 to 20).map(i => ("k", i.toLong, 5.0)) :+ (("k", 21L, 500.0)))
      .toDF("k", "i", "v")
    val med = Windows.rollingMedian(df, "k", Seq("i"), "v", radius = 3)
      .filter($"i" === 19L).collect()(0).getDouble(3)
    assert(med == 5.0, s"median moved on a single spike: $med")
  }
}

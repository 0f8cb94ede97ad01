package graft.operators

import graft.SparkTestBase

class DrawdownSpec extends SparkTestBase {
  import spark.implicits._

  test("drawdown is peak-to-trough of the running sum, not of raw values") {
    // steps: +10 +10 -15 -5 +20 → cum: 10 20 5 0 20 → peak-run: 10 20 20
    // 20 20 → drawdowns: 0 0 15 20 0 → max 20; final sum 20
    val df = Seq(1L -> 10.0, 2L -> 10.0, 3L -> -15.0, 4L -> -5.0,
      5L -> 20.0).map { case (i, v) => ("k", i, v) }.toDF("k", "i", "v")
    val r = Windows.maxDrawdown(df, "k", Seq("i"), "v").collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 20.0, s"max drawdown: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 20.0, s"final sum: ${r.getDouble(3)}")
  }

  test("monotone-up series has zero drawdown") {
    val df = (1 to 50).map(i => ("k", i.toLong, 1.0)).toDF("k", "i", "v")
    assert(Windows.maxDrawdown(df, "k", Seq("i"), "v")
      .collect()(0).getDouble(2) == 0.0)
  }
}

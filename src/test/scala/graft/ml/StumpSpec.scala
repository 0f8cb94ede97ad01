package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StumpSpec extends SparkTestBase {
  import spark.implicits._

  test("finds the planted threshold on a cleanly separable feature") {
    // label = x > 5 with x ∈ {0.5 … 9.5}: bins 0–4 are all-negative,
    // bins 5–9 all-positive → the perfect split is "x ≤ 5.0" (upper
    // edge of bin 4), 500/500, gain = parent gini = 1 − 2·0.5² = 0.5
    val df = (0 until 1000).map { i =>
      val x = (i % 10).toDouble + 0.5
      (x, (i % 37).toDouble, if (x > 5) 1 else 0)
    }.toDF("x", "noise", "y")
    val best = Stump.bestSplits(df, "y", Seq(
      Stump.Feature("x", col("x"), 0.0, 10.0, 10),
      Stump.Feature("noise", col("noise"), 0.0, 40.0, 8)), topK = 1)
      .collect()(0)
    assert(best.getString(0) == "x")
    assert(best.getDouble(1) == 5.0)
    assert(best.getLong(2) == 500L && best.getLong(3) == 500L)
    assert(best.getDouble(4) == 0.5)
  }

  test("boosting reweights misses and the second stump fixes them") {
    // y = (a > 5 OR b > 5) on a 10×10 grid. Round 1: a≤5 and b≤5 tie on
    // gain → feature-name tiebreak picks a. Its left side misclassifies
    // the (a≤5, b>5) quadrant; doubling those weights makes the b-split
    // the clear round-2 winner (weighted gains: b 0.12 vs a 0.0533).
    val df = (0 until 100).map { i =>
      val a = (i % 10).toDouble + 0.5
      val b = (i / 10).toDouble + 0.5
      (a, b, if (a > 5 || b > 5) 1 else 0)
    }.toDF("a", "b", "y")
    val rows = Stump.boostedSplits(df, "y", Seq(
      Stump.Feature("a", col("a"), 0.0, 10.0, 10),
      Stump.Feature("b", col("b"), 0.0, 10.0, 10)), rounds = 2)
      .collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "a" &&
      rows(0).getDouble(2) == 5.0)
    assert(rows(1).getInt(0) == 2 && rows(1).getString(1) == "b" &&
      rows(1).getDouble(2) == 5.0,
      s"round 2 must switch to b: ${rows(1)}")
    // weighted masses: left b≤5 = 50, right = 25·2 + 25 = 75
    assert(rows(1).getLong(3) == 50L && rows(1).getLong(4) == 75L)
    assert(rows(1).getDouble(5) == 0.12)
  }

  test("split stats are invariant to partitioning") {
    val df = (0 until 500).map(i =>
      ((i * 31 % 100).toDouble, if (i % 3 == 0) 1 else 0)).toDF("x", "y")
    def run(parts: Int) =
      Stump.bestSplits(df.repartition(parts), "y",
        Seq(Stump.Feature("x", col("x"), 0.0, 100.0, 20)), topK = 3)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(11))
  }
}

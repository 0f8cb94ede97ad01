package graft.ml

import graft.SparkTestBase

class CalibrationSpec extends SparkTestBase {
  import spark.implicits._

  test("reliability bins: perfect calibration has mean_p == pos_rate") {
    // bin 2 (p in [0.2,0.3)): 10 rows at p=0.25, 25% positive, etc.
    val rows = Seq.fill(30)((0.25, 0)) ++ Seq.fill(10)((0.25, 1)) ++
      Seq.fill(5)((0.85, 0)) ++ Seq.fill(35)((0.85, 1))
    val out = Calibration.reliabilityBins(rows.toDF("p", "y"), "p", "y")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(2).getLong(1) == 40 && out(2).getDouble(3) == 0.25)
    assert(out(8).getLong(1) == 40 && out(8).getDouble(3) == 0.875)
    assert(out(2).getDouble(2) == 0.25 && out(8).getDouble(2) == 0.85)
  }

  test("p = 1.0 lands in the last bin, not bin `bins`") {
    val out = Calibration.reliabilityBins(
      Seq((1.0, 1), (0.0, 0)).toDF("p", "y"), "p", "y", bins = 10)
      .collect().map(_.getInt(0)).sorted
    assert(out.toSeq == Seq(0, 9))
  }

  test("brier sum totals to n * brier score") {
    val df = Seq((0.8, 1), (0.3, 0), (0.5, 1)).toDF("p", "y")
    val total = Calibration.reliabilityBins(df, "p", "y")
      .collect().map(_.getDouble(4)).sum
    val expect = math.pow(0.2, 2) + math.pow(0.3, 2) + math.pow(0.5, 2)
    assert(math.abs(total - expect) < 1e-9)
  }

  test("woe/iv: separating feature gets high IV, flat feature ~zero") {
    val df = Seq(
      ("A", 1), ("A", 1), ("A", 1), ("A", 0),
      ("B", 0), ("B", 0), ("B", 0), ("B", 1)
    ).toDF("f", "y")
    val woe = Calibration.woeIv(df, "f", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(woe("A").getDouble(3) > 0)  // positive-heavy value
    assert(woe("B").getDouble(3) < 0)
    assert(woe("A").getLong(1) == 3 && woe("A").getLong(2) == 1)
    // iv terms are nonnegative by construction (share-diff and woe
    // always share a sign)
    assert(woe.values.forall(_.getDouble(4) >= 0))
    val flat = Seq(("A", 1), ("A", 0), ("B", 1), ("B", 0))
      .toDF("f", "y")
    val flatIv = Calibration.woeIv(flat, "f", "y")
      .collect().map(_.getDouble(4)).sum
    assert(math.abs(flatIv) < 1e-9)
  }

  test("auc: perfect separation = 1, reversed = 0, random-ish = 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("p", "y")
    assert(Calibration.aucExact(perfect, "p", "y").head().getDouble(2) == 1.0)
    val reversed = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("p", "y")
    assert(Calibration.aucExact(reversed, "p", "y").head().getDouble(2) == 0.0)
    val coin = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("p", "y")
    val r = Calibration.aucExact(coin, "p", "y").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.5) // all tied → midranks give exactly 1/2
  }

  test("auc midranks match the pairwise definition under partial ties") {
    // pairs (pos, neg): pos {0.7, 0.5}, neg {0.5, 0.3}
    // P(pos>neg) + 0.5 P(=) over 4 pairs: (1 + 1 + 0.5 + 1)/4 = 0.875
    val df = Seq((0.7, 1), (0.5, 1), (0.5, 0), (0.3, 0)).toDF("p", "y")
    assert(Calibration.aucExact(df, "p", "y").head().getDouble(2) == 0.875)
  }

  test("fitAndScore feeds bins: all probabilities are in (0,1)") {
    val df = Seq((-2.0, 0), (-1.0, 0), (1.0, 1), (2.0, 1)).toDF("x", "y")
    val scored = LogReg.fitAndScore(df, "y", Seq("x"), iters = 2)
    val ps = scored.collect().map(_.getDouble(1))
    assert(ps.forall(p => p > 0.0 && p < 1.0))
    val bins = Calibration.reliabilityBins(scored, "p", "label")
    assert(bins.collect().map(_.getLong(1)).sum == 4)
  }
}

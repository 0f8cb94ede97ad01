package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ThresholdsSpec extends SparkTestBase {
  import spark.implicits._

  test("confusion counts and ratios at hand-checkable thresholds") {
    // scores 1..10, label = score >= 7 (4 positives)
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 7) 1 else 0)).toDF("s", "y")
    val rows = Thresholds.sweep(df, col("s"), col("y"), Seq(0.0, 6.0, 8.0))
      .collect()
    // t=0: all 10 predicted positive → tp=4 fp=6, recall 1
    assert(rows(0).getLong(1) == 4 && rows(0).getLong(2) == 6)
    assert(rows(0).getDouble(4) == 0.4 && rows(0).getDouble(5) == 1.0)
    // t=6: predicted = {7..10} exactly → perfect
    assert(rows(1).getLong(1) == 4 && rows(1).getLong(2) == 0 &&
      rows(1).getLong(3) == 0)
    assert(rows(1).getDouble(6) == 1.0)
    // t=8: predicted {9,10} → tp=2, fn=2, precision 1, recall 0.5
    assert(rows(2).getLong(1) == 2 && rows(2).getLong(3) == 2)
    assert(rows(2).getDouble(4) == 1.0 && rows(2).getDouble(5) == 0.5)
  }

  test("decile lift: top decile captures the planted high-score positives") {
    // score = i; positives are exactly the top 100 of 1000 scores
    val df = (1 to 1000).map(i =>
      (i.toDouble, if (i > 900) 1 else 0, i.toLong)).toDF("s", "y", "id")
    val rows = Thresholds.decileLift(df, col("s"), col("y"), col("id"))
      .collect()
    // decile 1 = scores 901..1000 → all positive; lift = 1.0 / 0.1 = 10
    assert(rows(0).getLong(2) == 100L && rows(0).getDouble(4) == 10.0)
    // decile 2 has no positives; cumulative lift halves to 5
    assert(rows(1).getLong(2) == 0L && rows(1).getDouble(4) == 5.0)
    // final cumulative lift is 1 by construction
    assert(rows(9).getDouble(4) == 1.0)
  }

  test("sweep and lift are invariant to input partitioning") {
    val df = (1 to 2000).map(i =>
      ((i * 31 % 97).toDouble, if (i % 3 == 0) 1 else 0, i.toLong))
      .toDF("s", "y", "id")
    def sweep(parts: Int) =
      Thresholds.sweep(df.repartition(parts), col("s"), col("y"),
        Seq(10.0, 50.0, 90.0)).collect().map(_.toSeq).toSeq
    def lift(parts: Int) =
      Thresholds.decileLift(df.repartition(parts), col("s"), col("y"),
        col("id")).collect().map(_.toSeq).toSeq
    assert(sweep(1) == sweep(13))
    assert(lift(1) == lift(13))
  }

  test("empty-denominator ratios are null, not NaN") {
    val df = Seq((1.0, 0), (2.0, 0)).toDF("s", "y") // no positives at all
    val r = Thresholds.sweep(df, col("s"), col("y"), Seq(5.0)).collect()(0)
    assert(r.isNullAt(4), "precision with zero predicted positives")
    assert(r.isNullAt(5), "recall with zero actual positives")
    assert(r.isNullAt(6), "f1 with nothing positive anywhere")
  }
}

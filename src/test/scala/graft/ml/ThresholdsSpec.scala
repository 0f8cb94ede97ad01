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

  test("empty-denominator ratios are null, not NaN") {
    val df = Seq((1.0, 0), (2.0, 0)).toDF("s", "y") // no positives at all
    val r = Thresholds.sweep(df, col("s"), col("y"), Seq(5.0)).collect()(0)
    assert(r.isNullAt(4), "precision with zero predicted positives")
    assert(r.isNullAt(5), "recall with zero actual positives")
    assert(r.isNullAt(6), "f1 with nothing positive anywhere")
  }
}

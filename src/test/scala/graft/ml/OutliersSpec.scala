package graft.ml

import graft.SparkTestBase

class OutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("madOutliers matches the hand-computed robust scores") {
    // group a: 1..9 plus outlier 100 → median 5.5, MAD 2.5,
    // z(100) = 0.6745·94.5/2.5 = 25.4961 (flagged); z(1) = -1.2141 (not)
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0))
      .toDF("event_type", "value")
    val r = Outliers.madOutliers(df).collect().head
    assert(r.getAs[Long]("cnt") == 10L)
    assert(r.getAs[Double]("med") == 5.5)
    assert(r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Long]("n_flagged") == 1L)
    assert(math.abs(r.getAs[Double]("max_abs_score") - 25.4961) < 1e-9)
  }

  test("madOutliers: constant group (MAD 0) scores zero, flags nothing") {
    val df = (Seq.fill(5)(("c", 7.0)) ++
      ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0)))
      .toDF("event_type", "value")
    val rows = Outliers.madOutliers(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_flagged")).toMap
    assert(rows("c") == 0L && rows("a") == 1L)
    intercept[IllegalArgumentException](
      Outliers.madOutliers(df, threshold = -1.0))
    intercept[IllegalArgumentException](
      Outliers.madOutliers(df, valueCol = "value; drop"))
  }
}

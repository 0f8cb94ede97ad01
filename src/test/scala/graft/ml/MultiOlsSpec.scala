package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultiOlsSpec extends SparkTestBase {
  import spark.implicits._

  test("recovers planted coefficients on a noiseless linear system") {
    // y = 3 + 2·x1 − 5·x2 exactly → R² = 1, coefficients exact
    val df = (0 until 200).map { i =>
      val x1 = (i % 17).toDouble
      val x2 = (i % 7).toDouble
      (3.0 + 2.0 * x1 - 5.0 * x2, x1, x2)
    }.toDF("y", "x1", "x2")
    val r = MultiOls.ols2(df, col("y"), col("x1"), col("x2")).collect()(0)
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == -5.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("fit is invariant to partitioning") {
    val df = (0 until 400).map { i =>
      val x1 = (i * 13 % 29).toDouble
      val x2 = (i * 7 % 11).toDouble
      (1.5 * x1 - 0.5 * x2 + (i % 5), x1, x2)
    }.toDF("y", "x1", "x2")
    def run(parts: Int) =
      MultiOls.ols2(df.repartition(parts), col("y"), col("x1"), col("x2"))
        .collect()(0).toSeq
    assert(run(1) == run(16))
  }
}

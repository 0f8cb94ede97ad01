package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-noise: y = 3 + 2·x1 − x2 + e, e ∈ [−5, 5)
  private def data = (1 to 3000).map { i =>
    val x1 = (i % 50).toDouble
    val x2 = (i % 17).toDouble
    val e = ((i * 2654435761L % 1000) / 100.0) - 5.0
    (i, 3.0 + 2.0 * x1 - x2 + e, x1, x2)
  }.toDF("id", "y", "x1", "x2")

  test("empirical coverage honors the conformal guarantee") {
    val d = data
    val train = d.filter(col("id") % 3 === 0)
    val calib = d.filter(col("id") % 3 === 1)
    val eval_ = d.filter(col("id") % 3 === 2)
    val r = Conformal.intervalReport(train, calib, eval_,
      col("y"), col("x1"), col("x2"), level = 0.9).collect().head
    assert(r.getAs[Long]("n_train") == 1000)
    assert(r.getAs[Long]("n_calib") == 1000)
    assert(r.getAs[Long]("n_eval") == 1000)
    val cov = r.getAs[Double]("coverage")
    // finite-sample guarantee is ≥ level − 1/(n+1) up to exchangeability
    // noise; the uniform noise here keeps it tight around 0.9
    assert(cov >= 0.85 && cov <= 0.96, s"coverage $cov")
    assert(r.getAs[Double]("q_hat") > 0)
    assert(r.getAs[Double]("avg_width") ==
      math.rint(2.0 * r.getAs[Double]("q_hat") * 1e6) / 1e6)
  }

  test("noise-free data yields a near-zero interval and full coverage") {
    val d = (1 to 300).map { i =>
      val x1 = (i % 20).toDouble; val x2 = (i % 7).toDouble
      (i, 1.0 + 0.5 * x1 + 2.0 * x2, x1, x2)
    }.toDF("id", "y", "x1", "x2")
    val r = Conformal.intervalReport(
      d.filter(col("id") % 3 === 0), d.filter(col("id") % 3 === 1),
      d.filter(col("id") % 3 === 2),
      col("y"), col("x1"), col("x2"), level = 0.9).collect().head
    assert(r.getAs[Double]("q_hat") <= 1e-4)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("report is invariant to partitioning") {
    val d = data
    def run(df: org.apache.spark.sql.DataFrame) =
      Conformal.intervalReport(
        df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
        df.filter(col("id") % 3 === 2),
        col("y"), col("x1"), col("x2"), level = 0.9).collect().toSeq
    assert(run(d) == run(d.repartition(17)))
  }
}

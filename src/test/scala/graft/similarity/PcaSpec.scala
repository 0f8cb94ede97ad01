package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("symmetricEig solves a known 3x3 eigenproblem") {
    // A = diag(1,2,3) rotated is overkill; use a matrix with known
    // spectrum: [[2,1,0],[1,2,0],[0,0,5]] → eigenvalues 5, 3, 1
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (evals, evecs) = Pca.symmetricEig(a)
    assert(evals.zip(Seq(5.0, 3.0, 1.0)).forall { case (x, y) => math.abs(x - y) < 1e-10 })
    // residual ‖A·v − λ·v‖∞ per pair
    for (k <- 0 until 3) {
      val v = evecs(k)
      val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      val res = av.zip(v).map { case (x, y) => math.abs(x - evals(k) * y) }.max
      assert(res < 1e-10, s"residual $res for eigenpair $k")
    }
  }

  test("covarianceMatrix matches a driver-side brute force") {
    val data = Seq(
      Seq(1.0f, 2.0f, 0.5f), Seq(2.0f, 1.0f, -0.5f),
      Seq(0.0f, 3.0f, 1.5f), Seq(4.0f, -1.0f, 2.5f), Seq(1.0f, 1.0f, 0.0f))
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Covariance.covarianceMatrix(df, digits = 9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val n = data.length
    val cols = data.head.length
    val mean = (0 until cols).map(j => data.map(_(j).toDouble).sum / n)
    for (i <- 0 until cols; j <- i until cols) {
      val exp = data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      assert(math.abs(got((i + 1).toLong, (j + 1).toLong) - exp) < 1e-8,
        s"cov($i,$j)")
    }
  }

  test("covarianceMatrix is invariant to partition count (tree merge rounds)") {
    // 120 rows, d=4, deterministic values; fanIn=3 over 40 partitions
    // forces multiple tree rounds (40 → 14 → 5 → 2), while 1 partition
    // exercises the degenerate no-round path — the rounded matrix must
    // be identical across all layouts.
    val data = (0 until 120).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7).toFloat, (i % 13).toFloat,
        math.cos(i * 0.31).toFloat, (i % 7 - 3).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    def matOf(parts: Int, fanIn: Int) =
      Covariance.covarianceMatrix(df.repartition(parts), fanIn = fanIn)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = matOf(1, 64)
    assert(matOf(40, 3) == base, "40 partitions / fanIn 3 drifted")
    assert(matOf(17, 4) == base, "17 partitions / fanIn 4 drifted")
    assert(matOf(40, 64) == base, "40 partitions / no tree round drifted")
  }

  test("momentsOf driver tail is bounded by fanIn") {
    // structural: with 40 partitions and fanIn 3 the tree must reduce
    // to <= 3 partials before any driver fold; we can't observe the
    // collect directly, but n/mean must still be exact, proving the
    // tree merged every partial exactly once.
    val data = (0 until 200).map(i => (i.toLong, Seq(i.toFloat, (2 * i).toFloat)))
    val df = data.toDF("vec_id", "embedding").repartition(40)
    val (n, mean, c) = Covariance.momentsOf(df, "embedding", fanIn = 3)
    assert(n == 200L)
    assert(math.abs(mean(0) - 99.5) < 1e-9 && math.abs(mean(1) - 199.0) < 1e-9)
    // cov(x,2x) = 2·var(x); var_pop(0..199) = (200²−1)/12
    val varX = (200.0 * 200.0 - 1) / 12.0
    assert(math.abs(c(0)(1) - 2 * varX) < 1e-6)
  }

  test("fit + project: score variance equals the eigenvalue, scores decorrelate") {
    // anisotropic synthetic cloud: x ~ 10·t, y ~ t + noise, z ~ noise
    val data = (0 until 200).map { i =>
      val t = math.sin(i * 0.37) * 3
      val u = math.cos(i * 1.13)
      (i.toLong, Seq((10 * t + u).toFloat, (t - u).toFloat, (u * 0.3).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val model = Pca.fit(df, k = 2)
    assert(model.orthonormalityError < 1e-12)
    assert(model.eigenvalues(0) >= model.eigenvalues(1))
    val scored = Pca.project(df, model)
    val Array(v0, v1, c01) = scored
      .agg(var_pop(col("score_0")), var_pop(col("score_1")),
        covar_pop(col("score_0"), col("score_1")))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(v0 - model.eigenvalues(0)) < 1e-9 * math.max(1, v0))
    assert(math.abs(v1 - model.eigenvalues(1)) < 1e-9 * math.max(1, v1))
    // principal scores are uncorrelated by construction
    assert(math.abs(c01) < 1e-9 * math.max(1.0, math.sqrt(v0 * v1)))
  }
}

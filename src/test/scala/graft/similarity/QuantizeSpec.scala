package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),      // zero vector
    (3L, Array(-2.54f, 1.27f, 0.01f)))
    .toDF("vec_id", "embedding")

  test("quantized values stay in [-127, 127] and extremes hit ±127") {
    val q = Quantize.quantizeInt8(vecs)
      .select(col("vec_id"), col("qvec"), col("scale")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getDouble(2))).toMap
    assert(q.values.forall { case (qv, _) => qv.forall(v => v.abs <= 127) })
    // the max-|x| element always quantizes to exactly ±127
    assert(q(1L)._1.head == 127L)
    assert(q(3L)._1.head == -127L)
  }

  test("zero vector quantizes to zeros with scale 1") {
    val q = Quantize.quantizeInt8(vecs).filter(col("vec_id") === 2L)
      .select("qvec", "scale").collect().head
    assert(q.getSeq[Long](0).forall(_ == 0L) && q.getDouble(1) == 1.0)
  }

  test("reconstruction error honors the scale/2 contract") {
    val audit = Quantize.reconstructionAudit(vecs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(audit.values.forall(identity))
  }

  test("audit integer evidence matches hand computation") {
    // vec 1: scale = 1/127; q = (127, -63 (floor(-63.49..+0.5)), 32)
    val r = Quantize.reconstructionAudit(vecs)
      .filter(col("vec_id") === 1L)
      .select("q_sum", "q_min", "q_max").as[(Long, Long, Long)]
      .collect().head
    assert(r == ((127L - 63L + 32L, -63L, 127L)))
  }

  test("randomProject matches a driver-side matrix multiply exactly") {
    val dim = 16
    val data = Seq(
      (1L, Array.tabulate(dim)(i => (i + 1) * 0.125f)),
      (2L, Array.tabulate(dim)(i => math.cos(i + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val m = Quantize.projectionMatrix(dim, 4)
    val got = Quantize.randomProject(data, dim, 4)
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(j => r.getDouble(j + 1))).toMap
    val raw = Map(
      1L -> Array.tabulate(dim)(i => (i + 1) * 0.125f),
      2L -> Array.tabulate(dim)(i => math.cos(i + 1).toFloat))
    for ((id, emb) <- raw; j <- 0 until 4) {
      val expect = emb.map(_.toDouble).zip(m(j)).map { case (x, w) => x * w }.sum
      assert(math.abs(got(id)(j) - expect) < 1e-12, s"id $id comp $j")
    }
  }

  test("randomProject preserves norms in expectation (JL normalization)") {
    // 40 deterministic pseudo-random 64-d vectors: the MEAN of
    // ||y||²/||x||² must sit near 1 (per-vector variance is high at
    // outDim 8; the estimator over 40 vectors is what JL bounds)
    val dim = 64
    val rnd = new scala.util.Random(7)
    val data = (0 until 40).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    val proj = Quantize.randomProject(data, dim, 8)
    val ratios = proj.collect().map { r =>
      val y2 = (0 until 8).map(j => r.getDouble(j + 1)).map(x => x * x).sum
      r.getLong(0) -> y2
    }.toMap
    val x2 = data.collect().map { r =>
      val e = r.getSeq[Float](1)
      r.getLong(0) -> e.map(v => v.toDouble * v).sum
    }.toMap
    val mean = ratios.map { case (id, y2) => y2 / x2(id) }.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
    intercept[IllegalArgumentException](Quantize.randomProject(data, dim, 0))
  }
}

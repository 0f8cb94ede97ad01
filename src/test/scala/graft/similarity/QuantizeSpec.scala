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
}

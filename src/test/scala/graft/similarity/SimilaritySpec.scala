package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1, zero-vector null") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f)),
      (Array(0f, 0f), Array(1f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("sim"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 1.0) < 1e-9)
    assert(math.abs(got(1).get) < 1e-9)
    assert(math.abs(got(2).get + 1.0) < 1e-9)
    assert(got(3).isEmpty)
  }

  test("brute-force top-k finds the planted nearest neighbor first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f, 0.0f)),  // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.7f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, Seq(0L), k = 2).collect()
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(top.head.getAs[Int]("rank") == 1)
    assert(top.length == 2)
  }

  test("hyperplane signature is deterministic and bucket-stable") {
    val emb = Seq((0L, Array.fill(8)(0.3f)), (1L, Array.fill(8)(0.3f)))
      .toDF("vec_id", "embedding")
    val sigs = emb.select(
      Similarity.hyperplaneSignature(col("embedding"), dim = 8, nBits = 8).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1)) // identical vectors -> identical bucket
  }
}

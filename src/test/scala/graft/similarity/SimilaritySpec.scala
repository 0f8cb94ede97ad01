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

  test("knnJoin ranks each query's corpus neighbors by cosine") {
    val queries = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(0.99f, 0.14f, 0.0f)), // nearest to q0
      (11L, Array(0.1f, 0.99f, 0.0f)),  // nearest to q1
      (12L, Array(0.6f, 0.6f, 0.52f))).toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(queries, corpus, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 1, 10L), (0L, 2, 12L),
      (1L, 1, 11L), (1L, 2, 12L)))
  }

  test("searchJoin probing all cells reproduces the exact knnJoin bitwise") {
    // deterministic 8-dim vectors; disjoint id spaces
    def vec(seed: Long) = Array.tabulate(8)(j =>
      (((seed * 31 + j * 7 + 3) % 13) - 6).toFloat)
    val queries = (0L until 20L by 2).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val corpus = (1L until 40L by 2).map(i => (i, vec(i * 5)))
      .toDF("vec_id", "embedding")
    val idx = Ivf.buildIndex(corpus, nlist = 4)
    val full = Ivf.searchJoin(idx, queries, k = 3, nprobe = 4)
      .collect().map(_.toSeq)
    idx.assignments.unpersist()
    val exact = Similarity.knnJoin(queries, corpus, k = 3)
      .collect().map(_.toSeq)
    assert(full.toSeq == exact.toSeq)
  }

  test("semanticDecontaminate flags only vectors near an eval vector") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // ~identical to eval 100
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to both evals
      (3L, Array(0.71f, 0.0f, 0.71f))) // cos ~0.71 to eval 100
      .toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Array(0.999f, 0.01f, 0.0f)),
      (101L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, eval, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)))
    // lower threshold pulls in the 45-degree vector (nearest: eval 100
    // at ~0.7066 vs eval 101 at ~0.7071 -> 101 wins the max)
    val loose = Similarity.semanticDecontaminate(train, eval, tau = 0.5)
      .collect().map(r => r.getLong(0))
    assert(loose.toSeq == Seq(1L, 3L))
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

package graft.similarity

import graft.SparkTestBase

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // query (1,1,0); ids 1,2 are near-clones of each other (sim ≈ .997)
  // slightly off-plane; id 3 is almost as relevant but diverse from 1
  // (sim(3,1) ≈ .971 < .997); id 4 is an orthogonal filler.
  // λ=0.7 scores at step 2: clone 2 → .7·.98915 − .3·.99706 ≈ .3933,
  // diverse 3 → .7·.98060 − .3·.97092 ≈ .3951 → 3 must beat 2.
  private val vecs = Seq(
    (0L, Array(1.0f, 1.0f, 0.0f)),
    (1L, Array(1.0f, 1.0f, 0.2f)),
    (2L, Array(1.0f, 1.0f, 0.21f)),
    (3L, Array(1.2f, 0.8f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("greedy pick prefers the diverse candidate over the near-clone") {
    val picks = Similarity.mmrSelect(vecs, queryId = 0L, nCand = 4, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(picks == Seq((1, 1L), (2, 3L), (3, 2L)), s"got $picks")
  }

  test("lambda = 1 reduces to pure relevance order") {
    val picks = Similarity.mmrSelect(vecs, queryId = 0L, nCand = 4, k = 3,
        lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(picks == Seq(1L, 2L, 3L), s"pure relevance order: $picks")
  }
}

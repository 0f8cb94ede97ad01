package graft.similarity

import graft.SparkTestBase

class MutualNnSpec extends SparkTestBase {
  import spark.implicits._

  test("reciprocal pairs only; one-directional attraction is rejected") {
    // 1↔2 are each other's NN; 3 is closest to 1 but 1's NN is 2
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f, 0.0f)),   // ~cos 0.990 with 1
      (3L, Array(0.9f, -0.44f, 0.0f)),   // closer to 1 than to 2
      (4L, Array(0.0f, 0.0f, 1.0f)),     // orthogonal loner...
      (5L, Array(0.0f, 0.1f, 0.99f))     // ...whose mutual partner is 4
    ).toDF("vec_id", "embedding")
    val got = Similarity.mutualNearestNeighbors(vecs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 5L)), s"got $got")
  }

  test("pairs are invariant to partitioning") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 17) % 101).toFloat))
    }
    def run(parts: Int) =
      Similarity.mutualNearestNeighbors(
        vecs.toDF("vec_id", "embedding").repartition(parts))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }
}

package graft.similarity

import graft.SparkTestBase

class KnnLooSpec extends SparkTestBase {
  import spark.implicits._

  test("well-separated clusters score perfect LOO accuracy") {
    // two tight orthogonal clusters of 6, tiny deterministic jitter
    val vecs = (0 until 12).map { i =>
      val base = if (i < 6) Array(1.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f)
      val jit = base.clone()
      jit(2) = (i % 3) * 0.01f
      (i.toLong, jit, if (i < 6) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnLooAccuracy(vecs, k = 5).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows(0) == ((6L, 6L, 1.0)))
    assert(rows(1) == ((6L, 6L, 1.0)))
  }

  test("an isolated mislabeled point is predicted as its neighbors' class") {
    // 7 points of class 0 around the x-axis, one class-1 point among them
    val vecs = ((0 until 7).map(i =>
      (i.toLong, Array(1.0f, (i % 3) * 0.01f, 0.0f), 0)) :+
      ((99L, Array(1.0f, 0.005f, 0.0f), 1))).toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnLooAccuracy(vecs, k = 5).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1) == ((1L, 0L)), "the planted point must be voted class 0")
    assert(rows(0)._1 == 7L && rows(0)._2 == 7L)
  }
}

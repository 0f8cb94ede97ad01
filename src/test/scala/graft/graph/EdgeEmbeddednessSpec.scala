package graft.graph

import graft.SparkTestBase

class EdgeEmbeddednessSpec extends SparkTestBase {
  import spark.implicits._

  test("diagonal square: the diagonal sits in 2 triangles, rim edges in 1") {
    // edges 1-2, 1-3, 2-3, 2-4, 3-4: triangles (1,2,3) and (2,3,4);
    // edge (2,3) is in both, the other four edges in one each
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val m = Triangles.edgeEmbeddedness(edges).collect()
      .map(r => r.getAs[Long]("embeddedness") -> r.getAs[Long]("n_edges"))
      .toMap
    assert(m == Map(1L -> 4L, 2L -> 1L))
  }

  test("bridges surface as embeddedness 0") {
    // a triangle plus a pendant bridge 3-9
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L))
      .toDF("src", "dst")
    val m = Triangles.edgeEmbeddedness(edges).collect()
      .map(r => r.getAs[Long]("embeddedness") -> r.getAs[Long]("n_edges"))
      .toMap
    assert(m == Map(0L -> 1L, 1L -> 3L))
  }

  test("histogram mass equals the edge count; K4 gives all-2s") {
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val rows = Triangles.edgeEmbeddedness(k4).collect()
    assert(rows.map(_.getAs[Long]("n_edges")).sum == 6)
    assert(rows.length == 1 && rows.head.getAs[Long]("embeddedness") == 2)
  }

  test("consistent with triangleStats: Σ emb·edges = 3·triangles") {
    val edges = (1 to 300).map(i => ((i * 7 % 40).toLong, (i * 11 % 37).toLong))
      .toDF("src", "dst")
    val hist = Triangles.edgeEmbeddedness(edges).collect()
    val mass = hist.map(r =>
      r.getAs[Long]("embeddedness") * r.getAs[Long]("n_edges")).sum
    val tri = Triangles.triangleStats(edges).collect().head
      .getAs[Long]("n_triangles")
    assert(mass == 3 * tri)
  }
}

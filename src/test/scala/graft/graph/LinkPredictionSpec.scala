package graft.graph

import graft.SparkTestBase

class LinkPredictionSpec extends SparkTestBase {
  import spark.implicits._

  // square with one diagonal: 1-2, 1-3, 2-3, 2-4, 3-4; the only
  // non-edge is (1,4), with common neighbors {2, 3} (degrees 3 and 3)
  private def square = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    .toDF("src", "dst")

  test("scores the one missing edge of a diagonal square") {
    val rows = LinkPrediction.adamicAdarTopK(square, k = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("u"), r.getAs[Long]("w")) == ((1L, 4L)))
    assert(r.getAs[Long]("n_common") == 2)
    // jaccard = 2 / (deg1 + deg4 − common) = 2 / (2 + 2 − 2) = 1
    assert(r.getAs[Double]("jaccard") == 1.0)
    val aa = 2.0 / math.log(3.0)
    assert(math.abs(r.getAs[Double]("adamic_adar")
      - math.rint(aa * 1e6) / 1e6) < 1e-12)
  }

  test("degree cap drops hub middles from every score") {
    // cap 2 excludes both middles (deg 3) → no wedge survives
    assert(LinkPrediction.adamicAdarTopK(square, k = 10,
      maxMiddleDegree = 2).count() == 0)
  }

  test("existing edges are never candidates; direction and dups ignored") {
    val noisy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (4L, 2L),
      (3L, 4L), (3L, 4L)).toDF("src", "dst")
    val rows = LinkPrediction.adamicAdarTopK(noisy, k = 10).collect()
    assert(rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("w")))
      .toSeq == Seq((1L, 4L)))
  }

  test("invariant to partitioning") {
    val edges = (1 to 400).map(i => ((i * 7 % 50).toLong, (i * 13 % 47).toLong))
    val a = LinkPrediction.adamicAdarTopK(edges.toDF("src", "dst"), k = 15)
      .collect().toSeq
    val b = LinkPrediction.adamicAdarTopK(
        scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(9),
        k = 15)
      .collect().toSeq
    assert(a == b)
  }
}

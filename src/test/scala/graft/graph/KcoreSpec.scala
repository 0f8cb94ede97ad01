package graft.graph

import graft.SparkTestBase

class KcoreSpec extends SparkTestBase {
  import spark.implicits._

  test("peels a pendant chain, keeps the triangle core") {
    // triangle 1-2-3 plus chain 3-4-5: at k=2 the chain peels over two
    // rounds (5 first, then 4), the triangle survives with degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = Kcore.degreeHistogram(edges, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 3L))
    // k=3: nothing in this graph is a 3-core
    assert(Kcore.degreeHistogram(edges, k = 3, rounds = 3).isEmpty)
  }

  test("canonicalizes loops, duplicates, and reversed edges") {
    // duplicate + reversed edges of the triangle and a self-loop must
    // not inflate degrees past 2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L)).toDF("src", "dst")
    val out = Kcore.degreeHistogram(edges, k = 2, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 3L))
    intercept[IllegalArgumentException](
      Kcore.degreeHistogram(edges, k = 0))
    intercept[IllegalArgumentException](
      Kcore.degreeHistogram(edges, k = 2, rounds = 0))
  }
}

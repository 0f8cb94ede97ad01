package graft.graph

import graft.SparkTestBase

class KtrussSpec extends SparkTestBase {
  import spark.implicits._

  test("4-truss keeps K4 and peels the pendant triangle") {
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (k4 ++ tri).toDF("src", "dst")
    val r = Ktruss.trussHistogram(edges, k = 4, rounds = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    // K4's 6 edges each sit in 2 triangles; the pendant triangle's
    // support-1 edges peel in round one
    assert(r == Seq((2L, 6L)))
  }

  test("two triangles sharing an edge dissolve under 4-truss peeling") {
    // shared edge has support 2 and survives round 1 alone — but alone
    // it closes no triangle, so round 2 empties the graph
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val r = Ktruss.trussHistogram(edges, k = 4, rounds = 2).collect()
    assert(r.isEmpty)
  }

  test("census is deterministic across partitionings") {
    val edges = (1 to 800).map(k => ((k % 37).toLong, (k * 11 % 31).toLong))
      .toDF("src", "dst")
    val a = Ktruss.trussHistogram(edges, k = 4, rounds = 3).collect().toSeq
    val b = Ktruss.trussHistogram(edges.repartition(19), k = 4, rounds = 3)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}

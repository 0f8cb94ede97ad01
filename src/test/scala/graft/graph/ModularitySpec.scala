package graft.graph

import graft.SparkTestBase

class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  test("two dense triangles with one bridge score strongly modular") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val r = GraphStats.modularity(edges, rounds = 4).collect()(0)
    assert(r.getLong(1) == 7L, "n_edges")
    // label prop should find the two triangles (min-label: 1 and 4) —
    // hand computation: e_c = 3 each, d_c = 7 each, m = 7:
    // Q = 2·(3/7 − (7/14)²) = 6/7 − 1/2 = 5/14 ≈ 0.357143
    assert(r.getLong(0) == 2L, s"communities: ${r.getLong(0)}")
    assert(math.abs(r.getDouble(2) - 5.0 / 14.0) < 1e-6,
      s"Q = ${r.getDouble(2)}")
  }

  test("modularity is invariant to edge partitioning") {
    val edges = (0 until 300).map(i =>
      ((i % 40).toLong, ((i * 13) % 37).toLong)).toDF("src", "dst")
    def run(parts: Int) =
      GraphStats.modularity(edges.repartition(parts), rounds = 3)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(11))
  }

  test("a clique is a single community with Q = 0") {
    val nodes = 1L to 5L
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("src", "dst")
    val r = GraphStats.modularity(edges, rounds = 3).collect()(0)
    assert(r.getLong(0) == 1L)
    // one community holding everything: e_c = m, d_c = 2m → Q = 1 − 1 = 0
    assert(r.getDouble(2) == 0.0, s"Q = ${r.getDouble(2)}")
  }
}

package graft.graph

import graft.SparkTestBase

class GraphStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("star graph is maximally disassortative; self-loops and dups drop") {
    // hub 0 — leaves 1..5, plus a self-loop and a duplicate edge
    val edges = ((1L to 5L).map(l => (0L, l)) ++ Seq((0L, 0L), (0L, 1L)))
      .toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(edges).collect()(0)
    assert(r.getLong(0) == 5L, "5 distinct non-loop edges")
    assert(r.getLong(1) == 10L, "both orientations")
    assert(r.getDouble(2) == -1.0, "star = perfectly disassortative")
  }

  test("assortativity and power-law alpha are partition-invariant") {
    val edges = (0 until 400).map(i =>
      ((i % 50).toLong, ((i * 7) % 61).toLong)).toDF("src", "dst")
    def runs(parts: Int) = (
      GraphStats.degreeAssortativity(edges.repartition(parts))
        .collect().map(_.toSeq).toSeq,
      GraphStats.powerLawAlpha(edges.repartition(parts), kmin = 2)
        .collect().map(_.toSeq).toSeq)
    assert(runs(1) == runs(9))
  }

  test("degree-regular graph has undefined (null) assortativity") {
    // 4-cycle: every node degree 2 → zero variance → corr null
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(edges).collect()(0)
    assert(r.isNullAt(2), "constant degrees must yield null, not NaN")
  }
}

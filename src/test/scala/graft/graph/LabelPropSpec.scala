package graft.graph

import graft.SparkTestBase

class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  test("two cliques joined by a bridge resolve to two min-id communities") {
    // 4-cliques {1..4} and {10..13} with bridge 4-10: inside a 4-clique
    // the modal label is a real majority (not a tie), so after 3 rounds
    // each clique stabilizes on its min id — 3-cliques would NOT (every
    // neighborhood ties, and the min tie-break leaks labels across the
    // bridge round by round)
    val cliqueA = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val cliqueB = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val edges = (cliqueA ++ cliqueB :+ (4L, 10L)).toDF("src", "dst")
    val labels = LabelProp.labelsOf(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(labels(_) == 10L))
    val sizes = LabelProp.communities(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 4L, 10L -> 4L))
  }

  test("tie-break picks the smallest label deterministically") {
    // node 2 sees neighbors 1 and 3 once each after round 1 — the tie
    // must go to label 1, on any partitioning
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val one = LabelProp.labelsOf(edges.coalesce(1), rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = LabelProp.labelsOf(edges.repartition(5), rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) == 1L)
    assert(one == many)
    intercept[IllegalArgumentException](LabelProp.labelsOf(edges, rounds = 0))
  }
}

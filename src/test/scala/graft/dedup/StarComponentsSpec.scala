package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StarComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)], nodes: Seq[Long],
                     maxIter: Int = 50): Map[Long, Long] =
    StarComponents.connectedComponents(
        edges.toDF("a", "b"), nodes.toDF("id"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to its minimum in far fewer rounds than its diameter") {
    // a 40-long chain would need 40+ label-propagation rounds; star
    // contraction must finish inside 10
    val chain = (0L until 39L).map(i => (i, i + 1))
    val got = labels(chain, 0L until 40L, maxIter = 10)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 40)
  }

  test("separate components keep separate minima; isolated nodes self-label") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val got = labels(edges, Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("agrees with min-label propagation on a mixed fixture") {
    // chains + a clique + isolates, ids deliberately shuffled
    val edges = Seq((7L, 3L), (3L, 9L), (20L, 25L), (25L, 21L), (21L, 20L),
      (40L, 41L), (41L, 42L), (42L, 43L), (43L, 44L))
    val nodes = (Seq(7L, 3L, 9L, 20L, 25L, 21L, 50L) ++ (40L to 44L)).distinct
    val star = labels(edges, nodes)
    val prop = DupGroups.connectedComponents(
        edges.toDF("a", "b"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("result is invariant to input partitioning") {
    val edges = (0L until 30L).map(i => (i, (i + 7) % 30)).toDF("a", "b")
    val nodes = (0L until 30L).toDF("id")
    val a = StarComponents.connectedComponents(edges.repartition(2), nodes)
      .collect().map(_.toSeq).toSet
    val b = StarComponents.connectedComponents(edges.repartition(13), nodes)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("refuses to return partial labels when maxIter is too small") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      labels(chain, 0L until 201L, maxIter = 1)
    }
  }
}

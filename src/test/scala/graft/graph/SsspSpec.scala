package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SsspSpec extends SparkTestBase {
  import spark.implicits._

  private def distances(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                        rounds: Int): Map[Long, Long] =
    Sssp.boundedSssp(edges.toDF("src", "dst", "w"),
        seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("relaxation beats the greedy first path (classic BF case)") {
    // 0→2 direct costs 10, but 0→1→2 costs 3; needs 2 rounds to see it
    val edges = Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 2L))
    assert(distances(edges, Seq(0L), 1) == Map(0L -> 0L, 1L -> 1L, 2L -> 10L))
    assert(distances(edges, Seq(0L), 2) == Map(0L -> 0L, 1L -> 1L, 2L -> 3L))
  }

  test("bounded rounds bound reachability; multi-seed takes the min") {
    // chain 0→1→2→3→4, weight 1 each; extra seed at 3
    val chain = (0L to 3L).map(i => (i, i + 1, 1L))
    val d = distances(chain, Seq(0L, 3L), 2)
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
    // node 4 is closer to seed 3 than via the chain from 0
    val full = distances(chain, Seq(0L), 10)
    assert(full(4L) == 4L)
  }

  test("distances are invariant to edge partitioning") {
    val edges = (0 until 200).map { i =>
      ((i % 23).toLong, ((i * 7) % 29).toLong, (i % 5 + 1).toLong)
    }
    def run(parts: Int) =
      Sssp.boundedSssp(edges.toDF("src", "dst", "w").repartition(parts),
          Seq(0L).toDF("node"), rounds = 4)
        .orderBy("node").collect().map(_.toSeq).toSeq
    assert(run(1) == run(17))
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source(-set) shortest paths — Bellman-Ford
  * relaxation as iterated join+min-aggregate, the weighted companion to
  * [[Bfs]]'s hop counts (crawl-distance / referral-cost style signals).
  *
  * Scale shape: per round ONE join of the frontier distance vector to
  * the edge list (keyed on src) and one partial→final `min` aggregate
  * keyed on the node — the same cost class as a PageRank round.
  * Distances stay INTEGER (weights are required integral), so every
  * round is exact arithmetic: no float-order drift anywhere, and the
  * gate pins the full distance table bit-exactly. `localCheckpoint`
  * cuts lineage per round (lazy — a fixed-round run executes as one
  * job). Unreachable-within-`rounds` nodes simply don't appear, which
  * keeps the vector |reached| rows, not |V|.
  */
object Sssp {

  /** Distances after `rounds` Bellman-Ford relaxations from `seeds`
    * (one column `node`, distance 0). `edges` needs (src, dst, w) with
    * non-negative integral w; parallel edges should be pre-reduced to
    * their min weight. Returns (node, dist) = min path weight using at
    * most `rounds` hops, for every node reachable in ≤ rounds. */
  def boundedSssp(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w")).persist()
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    try {
      var r = 0
      while (r < rounds) {
        val relaxed = e
          .join(dist.select(col("node").as("src"), col("dist").as("d0")), "src")
          .select(col("dst").as("node"), (col("d0") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy("node").agg(min("dist").as("dist"))
          .localCheckpoint(eager = false)
        r += 1
      }
      dist
    } finally e.unpersist()
  }
}

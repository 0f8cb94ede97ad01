package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS: minimum hop distance from a seed set, the
  * neighborhood-expansion primitive behind "everything within k hops of
  * these domains/users" (crawl frontier expansion, contamination blast
  * radius, feature neighborhoods).
  *
  * Scale shape (the [[PageRank]] discipline): per hop ONE join of the
  * current FRONTIER — not the whole visited set — against the edge
  * list, one distinct, one anti-join against the visited set, and a
  * `localCheckpoint` to cut lineage. Work per round is proportional to
  * the frontier's out-edges, so the total is O(edges reachable within
  * `maxHops`), and distances never revisit a node (the anti-join is
  * exactly Dijkstra's "closed set" for unit weights). No driver-side
  * row data at all — the only scalar is the emptiness probe that stops
  * early when the frontier dies before `maxHops`. */
object Bfs {

  /** (node, dist) for every node within `maxHops` of `seeds` over
    * directed `edges` (src, dst); seeds themselves are dist 0. */
  def hopDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    var visited = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var frontier = visited.select("node")
    try {
      var hop = 1
      var done = maxHops == 0
      while (!done) {
        val next = frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node"))
          .distinct()
          .join(visited, Seq("node"), "left_anti")
          .select(col("node"), lit(hop).as("dist"))
          .localCheckpoint(eager = true)
        if (next.isEmpty) done = true
        else {
          visited = visited.unionByName(next).localCheckpoint(eager = true)
          frontier = next.select("node")
          hop += 1
          if (hop > maxHops) done = true
        }
      }
      visited.orderBy("node")
    } finally { e.unpersist(); () }
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss peeling (Cohen, "Trusses: Cohesive Subgraphs for Social
  * Network Analysis", NSA tech report 2008): iteratively delete edges
  * supported by fewer than k−2 triangles until (bounded rounds of)
  * fixpoint — the EDGE-cohesion analogue of [[Kcore]]'s vertex peeling,
  * and the standard community-core extractor one notch stronger than
  * triangle counting.
  *
  * Scale shape: each round is one [[Triangles]] oriented-wedge support
  * pass — O(m^{3/2}) hub-safe work, never the Σ deg² adjacency
  * self-join — followed by a filter; lineage is cut per round with an
  * eager localCheckpoint exactly like [[PageRank]]'s iterations. Edges
  * outside any triangle carry support 0 < k−2 and drop implicitly
  * (they produce no support row). Rounds are fixed and small: support
  * only decreases under deletion, so each round is monotone and the
  * census after R rounds is deterministic regardless of partitioning.
  */
object Ktruss {

  /** Run `rounds` peeling rounds at threshold `k`, then report the
    * surviving subgraph's support histogram (support → edge count;
    * edges in no triangle are out of census by construction). */
  def trussHistogram(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    var e = edges
      .filter(col("src") =!= col("dst")
        && col("src").isNotNull && col("dst").isNotNull)
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    // lazy lineage cuts — fixed rounds, no per-round driver reads, so
    // the peel folds into the caller's first action as one job (the
    // [[PageRank]]/[[Sssp]] discipline)
    for (_ <- 1 to rounds) {
      e = Triangles
        .edgeSupportOf(e.select(col("a").as("src"), col("b").as("dst")))
        .filter(col("sup") >= k - 2)
        .select("a", "b")
        .localCheckpoint(false)
    }
    Triangles.edgeSupportOf(e.select(col("a").as("src"), col("b").as("dst")))
      .groupBy(col("sup").as("support"))
      .agg(count(lit(1)).as("n_edges"))
      .orderBy("support")
  }
}

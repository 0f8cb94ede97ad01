package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting + clustering coefficients over an
  * undirected graph given as (src, dst) pairs — the graph-shape summary
  * that grades a link/citation corpus (spam farms are triangle-poor,
  * organic communities triangle-rich; the same signal PageRank
  * ([[PageRank]]) reads from a different angle).
  *
  * Uses the degree-ordered orientation of Schank & Wagner ("Finding,
  * Counting and Listing all Triangles in Large Graphs", WEA 2005, the
  * standard MapReduce/Spark formulation): orient every undirected edge
  * from its (degree, id)-smaller endpoint to the larger, enumerate
  * wedges only at each edge's SOURCE, and close them against the
  * oriented edge set. Orientation bounds every node's out-degree by
  * O(√m) regardless of in-degree — a celebrity node with 10⁸ followers
  * generates no wedge explosion, because its edges all point INTO it.
  * Total wedge work is O(m^{3/2}), the optimal bound, reached with two
  * shuffle joins; a naive neighbor-pair expansion would be Σ deg² and
  * die on the first hub.
  *
  * Exactly reproducible: dedup + integer joins, no floats until the
  * final coefficients.
  */
object Triangles {

  /** Cleaned undirected edge set (a < b), per-node degrees, and the
    * degree-ordered edge orientation — the shared front half of both
    * counting operators. `rv` is the (degree, id) rank struct of the
    * edge's rank-larger endpoint, used to order wedge legs. */
  private def oriented(edges: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val und = edges
      .filter(col("src") =!= col("dst")
        && col("src").isNotNull && col("dst").isNotNull)
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): rank structs compare lexicographically
    val ranked = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            struct(col("db").as("rd"), col("b").as("rn")).as("rv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"),
              struct(col("da").as("rd"), col("a").as("rn")).as("rv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rv").as("rv"))
    (und, deg, ranked)
  }

  /** The wedge-source side, EXPLICITLY hash-redistributed on `u` before
    * the self-join expands it. Without this, a small oriented edge list
    * (AQE-coalesced to one or two partitions — e.g. a k-truss round's
    * checkpointed survivor set) feeds a broadcast-pipelined wedge join
    * whose whole O(Σ d⁺²) expansion then runs inside those few tasks:
    * the round-10 truss probe measured a 574-node clique serializing
    * 31M wedges into ONE 20-second task. The exchange costs one pass
    * over the EDGE list (cheap) and spreads the expansion across
    * Σ-per-partition out-degree mass. Per-key work is still bounded by
    * the orientation (d⁺ ≤ O(√m)); a graph where one node's C(d⁺, 2)
    * alone exceeds a task budget needs the chunk-pair split (replicate
    * e2 per neighbor chunk) — documented, not yet needed at any probed
    * scale. */
  private def wedgeSource(ranked: DataFrame): DataFrame = {
    // explicit partition count: a bare repartition(col) is an
    // AQE-coalescable exchange, and the edge list is small enough that
    // AQE folds it right back into the few-partition shape this
    // exchange exists to break
    val n = ranked.sparkSession.sessionState.conf.numShufflePartitions
    ranked.repartition(n, col("u"))
  }

  /** Every triangle's three corners, one row per (triangle, corner).
    * Wedges form at the rank-smallest endpoint; the closing edge, if
    * present, is oriented rank-low -> rank-high by construction, so one
    * equi-join against the oriented set decides each wedge. */
  private def triangleCorners(ranked: DataFrame): DataFrame = {
    val src = wedgeSource(ranked)
    val e1 = src.select(col("u"), col("v").as("v1"), col("rv").as("r1"))
    val e2 = src.select(col("u"), col("v").as("v2"), col("rv").as("r2"))
    val wedges = e1.join(e2, Seq("u")).filter(col("r1") < col("r2"))
      .select(col("u"), col("v1").as("wu"), col("v2").as("wv"))
    val closing = ranked.select(col("u").as("wu"), col("v").as("wv"))
    wedges.join(closing, Seq("wu", "wv"))
      .select(explode(array(col("u"), col("wu"), col("wv"))).as("node"))
  }

  /** One row: nodes, undirected edge count, wedge count Σ C(deg,2),
    * triangle count, and the global clustering coefficient
    * `3·triangles / wedges` (0 when the graph has no wedge). Self-loops
    * dropped, parallel edges collapsed, direction ignored. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val (und, deg, ranked) = oriented(edges)
    // corners / 3 = triangle count (each triangle emits exactly 3 rows)
    val triangles = triangleCorners(ranked)
      .agg((count(lit(1)) / 3).cast("long").as("n_triangles"))
    val shape = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        // integral div: the double quotient would lose precision once
        // d(d-1) passes 2^53 (a 10^8-degree hub is enough)
        sum(expr("d * (d - 1) div 2")).as("n_wedges")))
    shape.crossJoin(broadcast(triangles))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Per-node local clustering coefficient (Watts & Strogatz):
    * `2·triangles(n) / (deg(n)·(deg(n)−1))`, 0 for degree-1 nodes.
    * The corner stream from the oriented enumeration already touches
    * each triangle exactly once per corner, so the per-node tally is
    * one hub-safe aggregation — no per-node neighborhood expansion. */
  def localClustering(edges: DataFrame): DataFrame = {
    val (_, deg, ranked) = oriented(edges)
    val perNode = triangleCorners(ranked)
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("n").as("node"), col("d").as("degree"))
      .join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("coeff",
        when(col("degree") >= 2,
          round(lit(2.0) * col("n_triangles")
            / (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)))
      .orderBy("node")
  }

  /** Edge-embeddedness histogram (Granovetter tie strength, and the
    * signal Ugander et al. 2012 used on the Facebook graph): per
    * UNDIRECTED EDGE, how many triangles contain it (= common neighbors
    * of its endpoints); reported as (embeddedness → n_edges), bounded
    * by the max embeddedness. Same O(m^{3/2}) oriented wedge
    * enumeration as [[triangleStats]] — each triangle explodes to its
    * three canonical edges, one aggregation per edge, left-join back so
    * bridge edges (embeddedness 0, the weak ties) are counted too. */
  def edgeEmbeddedness(edges: DataFrame): DataFrame = {
    val (und, _, ranked) = oriented(edges)
    und.join(positiveEdgeSupport(ranked), Seq("a", "b"), "left")
      .select(coalesce(col("sup"), lit(0L)).as("embeddedness"))
      .groupBy("embeddedness")
      .agg(count(lit(1)).as("n_edges"))
      .orderBy("embeddedness")
  }

  /** Per-edge triangle support (common-neighbor count) for every
    * canonical edge in ≥1 triangle, from the oriented wedge stream —
    * each triangle explodes to its three canonical edges, one
    * aggregation. Shared by [[edgeEmbeddedness]] (which left-joins the
    * zeros back) and [[Ktruss]]'s peeling rounds (which drop them). */
  private[graph] def positiveEdgeSupport(ranked: DataFrame): DataFrame = {
    val src = wedgeSource(ranked)
    val e1 = src.select(col("u"), col("v").as("v1"), col("rv").as("r1"))
    val e2 = src.select(col("u"), col("v").as("v2"), col("rv").as("r2"))
    val wedges = e1.join(e2, Seq("u")).filter(col("r1") < col("r2"))
      .select(col("u"), col("v1").as("wu"), col("v2").as("wv"))
    val closing = ranked.select(col("u").as("wu"), col("v").as("wv"))
    wedges.join(closing, Seq("wu", "wv"))
      .select(explode(array(
        struct(least(col("u"), col("wu")).as("a"),
          greatest(col("u"), col("wu")).as("b")),
        struct(least(col("u"), col("wv")).as("a"),
          greatest(col("u"), col("wv")).as("b")),
        struct(least(col("wu"), col("wv")).as("a"),
          greatest(col("wu"), col("wv")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("sup"))
  }

  /** [[positiveEdgeSupport]] from a raw (src, dst) edge list — runs the
    * same cleaning + degree orientation first. */
  private[graph] def edgeSupportOf(edges: DataFrame): DataFrame =
    positiveEdgeSupport(oriented(edges)._3)
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the directed
  * sibling of [[graft.dedup.StarComponents]] (whose min-label result is
  * only correct for undirected reachability). The classic distributed
  * scheme (Fleischer/Hendrickson/Pinar FW–BW, with the standard trim
  * step; Hong et al. PPoPP 2013 practice):
  *
  * per peel round, on the REMAINING subgraph:
  *   1. TRIM: nodes with no in-edges or no out-edges are singleton
  *      SCCs — remove them all at once (one degree aggregate). This
  *      absorbs the acyclic periphery that dominates real graphs.
  *   2. COLOR: forward min-label propagation to fixpoint — color(v) =
  *      min node id that reaches v. Each color class is a union of
  *      SCCs, and the class root (the node equal to its color) reaches
  *      every member.
  *   3. BACKWARD MARK: within each class, the root's SCC is exactly
  *      the members that reach the root — a frontier propagation over
  *      the CLASS-INTERNAL reversed edges. All classes peel their root
  *      SCC simultaneously.
  *
  * Scale shape: every step is joins + aggregates on (node)/(src,dst)
  * keys with `localCheckpoint` cutting lineage per round (the
  * [[PageRank]]/[[Bfs]] discipline); driver state is one scalar probe
  * per round (changed-count / emptiness — the house-approved
  * convergence pattern). Work per peel is proportional to the
  * remaining subgraph.
  *
  * Pathologies, stated honestly: color/backward rounds are bounded by
  * the largest SCC's forward/backward eccentricity (a bare N-cycle
  * needs N rounds — `maxPropRounds` refuses loudly; organic SCCs have
  * logarithmic diameter, measured in SCALE.md's planted-giant probe),
  * and a long DAG CHAIN of singleton SCCs
  * trims one end per peel — O(chain) rounds. The at-scale remedy is
  * FW–BW's divide-and-conquer recursion on the three partitions
  * (inside/forward-only/backward-only), which this bounded-round form
  * trades away for plan simplicity; `maxPeels` fails LOUDLY rather
  * than returning a partial labeling (the [[graft.dedup.StarComponents]]
  * refusal contract).
  */
object Scc {

  /** (node, scc) for every node of the directed graph `edges`
    * (`src`, `dst` columns); `scc` is the minimum node id in the
    * component (deterministic, partition-invariant). */
  def components(edges: DataFrame, maxPeels: Int = 32,
                 maxPropRounds: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(eager = true)
    var remaining = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = true)
    var rem = e0
    var result = Seq.empty[(Long, Long)].toDF("node", "scc")
      .localCheckpoint(eager = true)
    var peel = 0
    while (!remaining.isEmpty) {
      require(peel < maxPeels,
        s"SCC did not converge in $maxPeels peel rounds — refusing to " +
          "return a partial labeling (deep DAG-chain topology; raise " +
          "maxPeels or use the FW-BW recursion at this depth)")
      // 1. trim: no in-edges or no out-edges within remaining
      val hasIn = rem.select(col("dst").as("node")).distinct()
      val hasOut = rem.select(col("src").as("node")).distinct()
      val trimmed = remaining
        .join(hasIn, Seq("node"), "left_anti")
        .union(remaining.join(hasOut, Seq("node"), "left_anti"))
        .distinct()
        .select(col("node"), col("node").as("scc"))
        .localCheckpoint(eager = true)
      result = result.unionByName(trimmed).localCheckpoint(eager = true)
      remaining = remaining.join(trimmed.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      rem = rem
        .join(remaining.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(remaining.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst").localCheckpoint(eager = true)
      if (!remaining.isEmpty) {
        // 2. color: forward min-label to fixpoint
        var colors = remaining.select(col("node"), col("node").as("color"))
          .localCheckpoint(eager = true)
        var changed = 1L
        var round = 0
        while (changed > 0) {
          require(round < maxPropRounds,
            s"color propagation did not converge in $maxPropRounds rounds")
          val incoming = colors.join(rem, col("node") === col("src"))
            .select(col("dst").as("node"), col("color"))
          val next = colors.union(incoming)
            .groupBy("node").agg(min("color").as("color"))
            .localCheckpoint(eager = true)
          changed = next.as("n")
            .join(colors.as("c"), col("n.node") === col("c.node"))
            .filter(col("n.color") =!= col("c.color")).count()
          colors = next
          round += 1
        }
        // 3. backward mark: members that reach their class root, over
        // class-internal edges only
        val classEdges = rem
          .join(colors.select(col("node").as("src"), col("color").as("cs")), "src")
          .join(colors.select(col("node").as("dst"), col("color").as("cd")), "dst")
          .filter(col("cs") === col("cd"))
          .select(col("src"), col("dst"), col("cs").as("color"))
          .localCheckpoint(eager = true)
        var marked = colors.filter(col("node") === col("color"))
          .localCheckpoint(eager = true)
        var frontier = marked
        while (!frontier.isEmpty) {
          val next = classEdges
            .join(frontier.select(col("node").as("dst"),
              col("color").as("mc")), "dst")
            .filter(col("color") === col("mc"))
            .select(col("src").as("node"), col("color"))
            .distinct()
            .join(marked, Seq("node"), "left_anti")
            .localCheckpoint(eager = true)
          if (!next.isEmpty)
            marked = marked.unionByName(next).localCheckpoint(eager = true)
          frontier = next
        }
        result = result.unionByName(
          marked.select(col("node"), col("color").as("scc")))
          .localCheckpoint(eager = true)
        remaining = remaining.join(marked.select("node"), Seq("node"), "left_anti")
          .localCheckpoint(eager = true)
        rem = rem
          .join(remaining.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(remaining.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst").localCheckpoint(eager = true)
      }
      peel += 1
    }
    result.orderBy("node")
  }

  /** Condensation census: contract every SCC to one node and summarize
    * the resulting DAG — component count, size distribution extremes,
    * and the cross-component edge count (self-edges inside an SCC drop
    * by construction). One [[components]] pass + two broadcast-sized
    * joins of the edge list against the labeling. */
  def condensation(edges: DataFrame): DataFrame = {
    val labels = components(edges).localCheckpoint(eager = true)
    val dagEdges = condensationEdges(edges, labels)
    val sizes = labels.groupBy("scc").agg(count(lit(1)).as("sz"))
    val sstats = sizes.agg(count(lit(1)).as("n_sccs"),
      max("sz").as("max_scc_size"),
      sum(when(col("sz") === 1, 1L).otherwise(0L)).as("n_singletons"))
    val estats = dagEdges.agg(count(lit(1)).as("n_dag_edges"))
    sstats.crossJoin(broadcast(estats))
  }

  /** The contracted DAG's edge list: each original edge mapped to its
    * endpoints' SCC labels, intra-component edges dropped. Output
    * columns (src, dst) over SCC ids — a valid DAG input for
    * [[topoLayers]]. */
  def condensationEdges(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
      .join(labels.select(col("node").as("src"), col("scc").as("cs")), "src")
      .join(labels.select(col("node").as("dst"), col("scc").as("cd")), "dst")
      .filter(col("cs") =!= col("cd"))
      .select(col("cs").as("src"), col("cd").as("dst")).distinct()

  /** Kahn topological layers of a DAG: layer(v) = length of the longest
    * path ENDING at v (sources are layer 0) — the stage number a
    * dependency scheduler assigns. Iterative peeling: per round, nodes
    * whose remaining in-edges are exhausted join the layer, their
    * out-edges leave the graph; rounds = DAG depth, each one join + one
    * anti-join with a lineage cut. REFUSES loudly on a cycle (nodes
    * remain but no source exists) and past `maxLayers` — run
    * [[condensation]] first for general graphs. */
  def topoLayers(edges: DataFrame, maxLayers: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var rem = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(eager = true)
    var remaining = rem.select(col("src").as("node"))
      .union(rem.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = true)
    var result = Seq.empty[(Long, Long)].toDF("node", "layer")
      .localCheckpoint(eager = true)
    var layer = 0L
    while (!remaining.isEmpty) {
      require(layer < maxLayers,
        s"topoLayers did not finish in $maxLayers layers")
      val sources = remaining
        .join(rem.select(col("dst").as("node")).distinct(),
          Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      require(!sources.isEmpty,
        "topoLayers: no in-degree-0 node remains — the graph has a " +
          "cycle; condense SCCs first")
      result = result.unionByName(
        sources.select(col("node"), lit(layer).as("layer")))
        .localCheckpoint(eager = true)
      remaining = remaining.join(sources, Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      rem = rem.join(sources.select(col("node").as("src")),
          Seq("src"), "left_anti")
        .select("src", "dst").localCheckpoint(eager = true)
      layer += 1
    }
    result.orderBy("node")
  }
}

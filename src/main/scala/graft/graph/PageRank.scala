package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list — the domain-graph quality signal
  * web-corpus curation uses (rank crawl domains by link authority, keep
  * documents from reputable ones), and the canonical iterative-join
  * workload a batch engine must run well.
  *
  * Scale shape (same discipline as
  * [[graft.dedup.DupGroups.connectedComponents]]): per iteration ONE
  * shuffle joins the rank vector (|V| rows, 16 bytes each) to the
  * normalized edge list and one partial→final aggregate re-keys by
  * destination. The edge normalization is computed once and persisted.
  * `localCheckpoint` cuts lineage each round — without it the
  * plan tree doubles per iteration and the job dies at planning time
  * long before 100 TB. The only driver-side value is one scalar: the
  * node count (read once). The per-round dangling mass is a one-row
  * aggregate BROADCAST inside the plan, so a fixed-iteration run
  * executes as a single job with no per-round driver barrier;
  * checkpoints turn eager only when `tol > 0` forces a per-round
  * convergence read anyway.
  *
  * Fixed `iters` keeps the gate deterministic; `tol > 0` adds the
  * convergence early-exit a 100×-scale graph wants — stop as soon as
  * `Σ|r_i − r_{i−1}|` (one extra scalar aggregate per round, still no
  * driver-side row data) drops below the threshold, so `iters` becomes
  * a CAP rather than a fixed cost.
  */
object PageRank {

  /** Ranks after `iters` rounds of `r = (1−d)/N + d·(Σ in + dangling/N)`,
    * or fewer when `tol > 0` and the L1 rank delta between consecutive
    * rounds drops below `tol` (converged — later rounds move ranks less
    * than any consumer can observe at that tolerance).
    * `edges` needs (src, dst, weight) — parallel edges should be
    * pre-aggregated; weights must be positive. Returns (node, rank) for
    * every node appearing as src or dst; ranks sum to 1. */
  def pagerank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 10, tol: Double = 0.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(tol >= 0.0, s"tol must be >= 0 (0 disables early exit), got $tol")
    // fail fast on the positive-weight contract: a null or non-positive
    // weight would yield null/infinite transition probabilities that
    // silently lose rank mass (a null-weight src is NOT dangling — it
    // still appears in normEdges, so its mass would vanish rather than
    // redistribute). min() ignores nulls, so count them explicitly.
    // One column-pruned scan of the weight column, before any iteration.
    val wCheck = edges.agg(
      min(col("weight").cast("double")).as("mn"),
      count(when(col("weight").isNull, 1)).as("n_null")).head()
    require(wCheck.getLong(1) == 0L,
      s"edge weights must be non-null, found ${wCheck.getLong(1)} null weight(s)")
    val minW = if (wCheck.isNullAt(0)) null else wCheck.get(0)
    require(minW == null || minW.asInstanceOf[Double] > 0.0,
      s"edge weights must be positive, found min weight $minW")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct().persist()
    val n = nodes.count().toDouble
    val outW = edges.groupBy("src").agg(sum("weight").as("out_w"))
    val normEdges = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("out_w")).as("p"))
      .persist()
    val danglingNodes = nodes
      .join(normEdges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .persist()
    // checked ONCE: a sink-free graph (the common derived-key case) must
    // not pay a per-iteration dangling subtree for a mass that is
    // always zero
    val hasDangling = !danglingNodes.isEmpty
    // Checkpoints are EAGER only when the loop must read a scalar from
    // the driver each round anyway (tol > 0). With fixed iterations the
    // whole chain stays lazy: every per-round quantity — including the
    // dangling mass, folded in as a broadcast one-row aggregate instead
    // of a per-round collect — lives in the plan, so the caller's first
    // action runs ONE job for all rounds instead of paying 2 driver
    // round-trips per round. The lazy localCheckpoint still caches each
    // round's ranks on first computation (the dangling subtree and the
    // contribution join share it) and still cuts lineage for large
    // iteration counts.
    val eagerRounds = tol > 0.0
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(eager = eagerRounds)
    try {
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        // The rank vector is |V| rows of 16 bytes — the driver already
        // holds |V| (`n`), so the broadcast decision is made from a
        // MEASURED size, not a planner guess (checkpointed frames carry
        // no stats, so Spark alone would always shuffle). Small graphs
        // (≤ ~16 MB of ranks) broadcast and skip re-shuffling the edge
        // list every round; web-scale graphs keep the shuffle join,
        // which co-partitions with the persisted normEdges.
        val rankSide = ranks.withColumnRenamed("node", "src")
        val contrib = normEdges
          .join(if (n <= 1e6) broadcast(rankSide) else rankSide, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("p") * col("rank")).as("in_rank"))
        val base = nodes.join(contrib, Seq("node"), "left")
        // rank mass sitting on sink nodes redistributes uniformly — a
        // one-row aggregate broadcast into every partition (identical
        // arithmetic to the former driver-side read: same sum, then /n)
        val withMass =
          if (hasDangling) base.crossJoin(broadcast(
            danglingNodes.join(ranks, "node")
              .agg(coalesce(sum("rank"), lit(0.0)).as("_dmass"))))
          else base.withColumn("_dmass", lit(0.0))
        val next = withMass
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("in_rank"), lit(0.0)) + col("_dmass") / lit(n)))
              .as("rank"))
          .localCheckpoint(eager = eagerRounds)
        if (tol > 0.0) {
          // L1 delta vs the previous round — both sides are checkpointed
          // |V|-row vectors, so this is one broadcast-or-shuffle join +
          // a scalar agg, the same cost class as the dangling read
          val delta = next.join(
              ranks.withColumnRenamed("rank", "prev_rank"), "node")
            .agg(sum(abs(col("rank") - col("prev_rank")))).head().getDouble(0)
          converged = delta < tol
        }
        ranks = next
        it += 1
      }
      ranks
    } finally {
      nodes.unpersist()
      normEdges.unpersist()
      danglingNodes.unpersist()
    }
  }

  /** Personalized PageRank: teleportation jumps to a SEED SET instead of
    * uniformly everywhere, so rank measures proximity to the seeds —
    * the "expand from a trusted whitelist" signal (TrustRank, Gyöngyi
    * et al. 2004) web-corpus curation uses to score domains near known
    * good ones, and the standard similarity kernel for
    * recommend-by-graph.
    *
    * Recurrence: `r = (1−d)·t + d·(Σ in + dangling·t)` with `t`
    * uniform over `seeds` and zero elsewhere — dangling mass re-enters
    * through the seed vector too, keeping Σr = 1 exactly. Same scale
    * shape as [[pagerank]]: one join + one aggregate per round over a
    * persisted normalized edge list, lineage cut each round, the
    * dangling mass a broadcast one-row aggregate; the teleport column
    * is carried on the node vector (one broadcast semi-join at setup),
    * so per-round cost is identical to the global variant.
    *
    * `seeds` is a one-column (`node`) frame; seeds absent from the
    * graph still receive teleport mass (they exist in the output). */
  def personalized(edges: DataFrame, seeds: DataFrame,
                   damping: Double = 0.85, iters: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val seedIds = seeds.select(col("node")).distinct().persist()
    val nSeeds = seedIds.count().toDouble
    require(nSeeds > 0, "personalized: seed set is empty")
    // node universe = graph nodes ∪ seeds, each tagged with its teleport
    // probability (1/|S| or 0) once, up front
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .union(seedIds.select(col("node")))
      .distinct()
      .join(seedIds.withColumn("_t", lit(1.0 / nSeeds)), Seq("node"), "left")
      .select(col("node"), coalesce(col("_t"), lit(0.0)).as("t"))
      .persist()
    val outW = edges.groupBy("src").agg(sum("weight").as("out_w"))
    val normEdges = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("out_w")).as("p"))
      .persist()
    val danglingNodes = nodes.select("node")
      .join(normEdges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .persist()
    val hasDangling = !danglingNodes.isEmpty
    // same measured-size broadcast policy as [[pagerank]]
    val n = nodes.count()
    var ranks = nodes.select(col("node"), col("t").as("rank"))
      .localCheckpoint(eager = false)
    try {
      var it = 0
      while (it < iters) {
        val rankSide = ranks.withColumnRenamed("node", "src")
        val contrib = normEdges
          .join(if (n <= 1e6) broadcast(rankSide) else rankSide, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("p") * col("rank")).as("in_rank"))
        val base = nodes.join(contrib, Seq("node"), "left")
        val withMass =
          if (hasDangling) base.crossJoin(broadcast(
            danglingNodes.join(ranks, "node")
              .agg(coalesce(sum("rank"), lit(0.0)).as("_dmass"))))
          else base.withColumn("_dmass", lit(0.0))
        ranks = withMass
          .select(col("node"), col("t"),
            (lit(1 - damping) * col("t") + lit(damping) *
              (coalesce(col("in_rank"), lit(0.0)) + col("_dmass") * col("t")))
              .as("rank"))
          .localCheckpoint(eager = false)
        it += 1
      }
      ranks.select("node", "rank")
    } finally {
      seedIds.unpersist()
      nodes.unpersist()
      normEdges.unpersist()
      danglingNodes.unpersist()
    }
  }
}

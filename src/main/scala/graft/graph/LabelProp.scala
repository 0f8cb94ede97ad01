package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) with a
  * deterministic tie-break: every node starts labeled with its own id;
  * each round every node adopts the modal label among its neighbors,
  * ties broken by the SMALLEST label, nodes with no neighbors keeping
  * their current label. The randomized-order variant in the paper is
  * irreproducible across runs; the synchronous + min-tie-break variant
  * is exactly reproducible on any partitioning, which is what an oracle
  * gate (and an incremental production run) needs. Communities on a
  * near-dup or citation graph group template families / content farms —
  * the coarse-grained counterpart to [[Kcore]]'s density filter.
  *
  * Scale shape (per round): neighbor-label expansion is one join of the
  * undirected edge list against the current label table keyed on an
  * 8-byte vertex id, the modal pick is one hash aggregation using the
  * same `min_by(label, (-count, label))` reducer as
  * `Relational.modeByGroup` — no windows, no sorts, reducer state one
  * row per (node, label). Fixed `rounds` keeps the job DAG static
  * (synchronous LPA can two-cycle on bipartite structure; a bounded
  * round count makes even that deterministic), and `localCheckpoint`
  * cuts lineage per round.
  */
object LabelProp {

  /** `(label, n_members)` community sizes after `rounds` synchronous
    * propagation rounds over the canonicalized undirected simple graph
    * (self-loops dropped, parallel/reversed duplicates collapsed). */
  def communities(edges: DataFrame, rounds: Int = 4): DataFrame =
    labelsOf(edges, rounds)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))

  /** Per-node labels `(v, label)` after `rounds` rounds. */
  def labelsOf(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
    // lazy lineage cuts — fixed rounds, no per-round driver reads, so
    // the whole propagation executes as one job at the caller's first
    // action (the [[PageRank]]/[[Sssp]] discipline); the checkpoint
    // still caches adj/labels for their multiple per-round consumers
    val adj = und.select(col("a").as("v"), col("b").as("u"))
      .unionAll(und.select(col("b").as("v"), col("a").as("u")))
      .localCheckpoint(false)
    var labels = adj.select(col("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val picked = adj
        .join(labels.select(col("v").as("u"), col("label")), "u")
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy("v")
        .agg(min_by(col("label"), struct(negate(col("c")), col("label")))
          .as("label"))
      // left join keeps no-neighbor nodes on their current label; over
      // this canonicalized graph every node has a neighbor, but the
      // contract shouldn't depend on that
      labels = labels.select(col("v"), col("label").as("_old"))
        .join(picked, Seq("v"), "left")
        .select(col("v"), coalesce(col("label"), col("_old")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kleinberg's HITS (Hyperlink-Induced Topic Search, JACM 1999): mutually
  * recursive hub and authority scores over a directed graph. Each
  * iteration sets `auth(v) = Σ_{u→v} hub(u)` then `hub(u) = Σ_{u→v}
  * auth(v)`, L2-normalizing after each half-step. On link graphs the two
  * scores separate "pages that point at good content" from "content many
  * hubs point at" — on a crawl corpus the authority tier is the
  * keep-list seed and the hub tier finds index/spam link farms, the same
  * triage PageRank's single score can't split.
  *
  * Scale shape (per iteration): two join+aggregate shuffles, each keyed
  * on an 8-byte vertex id over the edge list — identical cost profile to
  * one PageRank round ([[PageRank.pagerank]]). The L2 norm is a scalar
  * aggregate broadcast back via crossJoin (never a driver collect of
  * per-node rows). `localCheckpoint` cuts lineage each round so the plan
  * stays fixed-size in `iters`; fixed iteration count keeps the job DAG
  * static, the same bounded-round contract as [[Kcore]].
  */
object Hits {

  /** `(node, hub, auth)` after `iters` full hub+authority rounds over
    * the de-duplicated directed edge set (self-loops kept — HITS has no
    * dangling-mass correction to confuse). Scores start uniform at 1
    * and are L2-normalized after every half-step, so both columns have
    * unit L2 norm in the result. */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // lazy lineage cuts — fixed rounds, the L2 norms are broadcast
    // one-row aggregates inside the plan (never driver reads), so the
    // full hub/authority recursion executes as one job at the caller's
    // first action (the [[PageRank]]/[[Sssp]] discipline)
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)

    def l2normed(scores: DataFrame, c: String): DataFrame = {
      val z = scores.agg(sqrt(sum(col(c) * col(c))).as("_z"))
      scores.crossJoin(broadcast(z))
        .select(col("node"), (col(c) / col("_z")).as(c))
    }

    var hub = nodes.withColumn("hub", lit(1.0))
    var auth = nodes.withColumn("auth", lit(1.0))
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst").as("node2"))
        .agg(sum("hub").as("auth"))
      auth = l2normed(
        nodes.join(aRaw, nodes("node") === aRaw("node2"), "left")
          .select(nodes("node"), coalesce(col("auth"), lit(0.0)).as("auth")),
        "auth").localCheckpoint(false)
      val hRaw = e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src").as("node2"))
        .agg(sum("auth").as("hub"))
      hub = l2normed(
        nodes.join(hRaw, nodes("node") === hRaw("node2"), "left")
          .select(nodes("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub").localCheckpoint(false)
    }
    nodes.join(hub, "node").join(auth, "node")
      .select(col("node"), col("hub"), col("auth"))
  }
}

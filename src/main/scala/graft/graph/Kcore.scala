package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling (Seidman 1983's coreness, computed by the
  * standard iterative deletion): each round removes every vertex whose
  * degree in the SURVIVING subgraph is below `k`, together with its
  * edges. After `rounds` rounds the survivors are a superset of the true
  * k-core, exact once a round removes nothing — on real graphs peeling
  * converges in a handful of rounds, and the bounded-round contract keeps
  * the operator a fixed-length job DAG instead of a data-dependent loop
  * (the same trade the BPE trainer documents). k-cores are the standard
  * "dense hub" extractor on link/interaction graphs — spam rings and
  * boilerplate template clusters concentrate in high-k cores.
  *
  * Scale shape: per round ONE degree aggregation (explode edges to
  * endpoint rows, hash-agg) and two semi-joins keyed on the vertex id —
  * all shuffles on 8-byte keys, per-round cost proportional to the
  * SURVIVING edge count (monotonically shrinking). `localCheckpoint`
  * cuts lineage each round so the plan does not grow with `rounds`.
  */
object Kcore {

  /** Degree histogram `(deg, n_vertices)` of the subgraph surviving
    * `rounds` peel rounds at threshold `k`. Edges are canonicalized to
    * an undirected simple graph first (self-loops dropped, parallel and
    * reversed duplicates collapsed), so `deg` is the true simple-graph
    * degree. Vertices isolated by the peeling vanish (degree rows come
    * from edges). */
  def degreeHistogram(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .distinct()
    // LAZY checkpoints (the [[PageRank]] fixed-iteration discipline):
    // no round reads a driver scalar, so the whole peel executes as ONE
    // job at the caller's first action instead of one eager job per
    // round — the checkpoint still caches each round's survivors on
    // first computation and still cuts plan lineage (LogicalRDD wraps
    // the round's plan immediately, eager or not).
    var cur = und.localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val keep = cur.select(col("a").as("v"))
        .unionAll(cur.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("v")
      val next = cur
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(false)
      cur = next
    }
    cur.select(col("a").as("v")).unionAll(cur.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .groupBy("deg").agg(count(lit(1)).as("n_vertices"))
      .orderBy("deg")
  }
}

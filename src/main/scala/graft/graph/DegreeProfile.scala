package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph shape diagnostics from the edge list alone — the pre-flight
  * read before running PageRank/triangles/BFS at scale: degree moments
  * tell you whether the graph is hub-dominated (salting / chunking
  * needed) and the Hill tail exponent estimates how heavy the degree
  * distribution's tail is (α ≈ 2–3 for web-like graphs; smaller =
  * heavier = more skew danger).
  *
  * One DISTINCT over the edges, one keys-only degree aggregation, one
  * summary aggregate — no joins, no iteration, reducer state bounded
  * by node count. */
object DegreeProfile {

  /** One-row summary: node/edge counts, degree mean/max, exact p90
    * degree, and the discrete Hill estimator
    * `α = 1 + n_tail / Σ ln(d / (d_min − ½))` over nodes with
    * `d ≥ d_min` (Clauset–Shalizi–Newman's discrete correction; the
    * default `d_min = 2` drops the uninformative degree-1 mass). */
  def outDegreeProfile(edges: DataFrame, dMin: Int = 2): DataFrame = {
    require(dMin >= 2, s"dMin must be >= 2, got $dMin")
    val degrees = edges.select("src", "dst").distinct()
      .groupBy("src").agg(count(lit(1)).as("d"))
    degrees.agg(
      count(lit(1)).as("n_nodes"),
      sum("d").as("n_edges"),
      round(avg("d"), 4).as("mean_deg"),
      max("d").as("max_deg"),
      round(expr("percentile(d, 0.9)").cast("double"), 4).as("p90_deg"),
      round(lit(1.0) +
        count(when(col("d") >= dMin, 1)) /
          sum(when(col("d") >= dMin, log(col("d") / (dMin - 0.5)))), 4)
        .as("hill_alpha"))
  }
}

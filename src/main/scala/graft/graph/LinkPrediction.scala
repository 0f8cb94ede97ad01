package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction — common neighbors, Jaccard,
  * and Adamic–Adar (Adamic & Adar, "Friends and neighbors on the Web",
  * Social Networks 2003) — the classic "which edges are missing"
  * scores used to grade link corpora and propose candidate joins
  * between near-duplicate document clusters.
  *
  * Shape: every score is a sum over WEDGES u–z–w, so the whole
  * computation is one self-join of the adjacency list on the middle
  * node z followed by a (u, w) aggregation — two shuffles, no
  * all-pairs. The quadratic hazard is a hub middle (deg z = d emits
  * C(d, 2) wedges); since a hub's Adamic–Adar contribution is the
  * *smallest* (1/ln d → 0), the standard mitigation is to drop middles
  * above a degree cap. The cap is part of the operator's semantics
  * (deterministic, oracle-replicable), not a sampling heuristic: at
  * 100 TB pick a cap like 10⁴ and the wedge volume is bounded by
  * m · cap while the dropped mass is ≤ wedges(hub) / ln(cap).
  *
  * Self-loops dropped, parallel edges collapsed, direction ignored;
  * existing edges are anti-joined out of the candidate set (link
  * prediction scores NON-edges). Integer joins throughout; floats only
  * in the final scores.
  */
object LinkPrediction {

  /** Top-`k` non-adjacent node pairs by Adamic–Adar score. Output:
    * (u, w, n_common, jaccard, adamic_adar), ordered by
    * (adamic_adar desc, u, w) — the score ties broken by the pair id so
    * the cut is total-ordered and exactly reproducible.
    *
    * @param maxMiddleDegree wedge middles with degree above this are
    *   excluded from ALL scores (including n_common/jaccard, keeping
    *   the three scores consistent on the same wedge population). */
  def adamicAdarTopK(edges: DataFrame, k: Int = 20,
                     maxMiddleDegree: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val und = edges
      .filter(col("src") =!= col("dst")
        && col("src").isNotNull && col("dst").isNotNull)
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // adjacency in both directions: one row per (middle z, neighbor n)
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
    val midDeg = deg.select(col("n").as("z"), col("d").as("dz"))
      .filter(col("dz") <= maxMiddleDegree)
    // wedges through each surviving middle; u < w canonicalizes the pair
    val wedges = adj.select(col("z"), col("n").as("u"))
      .join(adj.select(col("z"), col("n").as("w")), Seq("z"))
      .filter(col("u") < col("w"))
      .join(midDeg, Seq("z"))
    val scored = wedges.groupBy("u", "w")
      .agg(count(lit(1)).as("n_common"),
        sum(lit(1.0) / log(col("dz").cast("double"))).as("aa"))
    // non-edges only: drop candidate pairs that are already adjacent
    val candidates = scored.join(und,
      scored("u") === und("a") && scored("w") === und("b"), "left_anti")
    candidates
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("w"), col("d").as("dw")), Seq("w"))
      .select(col("u"), col("w"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("du") + col("dw") - col("n_common")), 6).as("jaccard"),
        round(col("aa"), 6).as("adamic_adar"))
      .orderBy(desc("adamic_adar"), asc("u"), asc("w"))
      .limit(k)
  }
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) — the
  * standard way a retrieval pipeline combines a lexical ranker
  * ([[Bm25]]) with a dense ranker ([[graft.similarity.Similarity]]):
  * `rrf(d) = Σ_r 1 / (k + rank_r(d))` over the rankers that returned
  * `d`, with the conventional `k = 60`. Rank-based fusion needs no
  * score calibration between rankers — exactly why it's the default in
  * hybrid RAG retrieval.
  *
  * Scale shape: the inputs are each ranker's TOP-N list — bounded,
  * ranker-side-truncated frames (the expensive corpus scans happen
  * inside the rankers, which keep their own scale shapes). Fusion
  * itself is a full-outer join + one aggregation over ≤ Σ N rows;
  * every join side broadcasts. RRF scores are exact rational sums of
  * 1/(k+rank) over integer ranks, so both engines compute identical
  * doubles — no float-order sensitivity anywhere.
  */
object Fusion {

  /** Fuse named rankings. Each input DataFrame must expose `idCol` and
    * a ranking-determining column pair already ordered by its ranker;
    * here they must carry an explicit `rank` column (1-based, dense,
    * deterministic). Returns top `topN` of
    * `(id, rrf_score, rank_<name>...)` ordered by score desc, id asc;
    * a doc absent from a ranker has a NULL rank there and contributes
    * nothing for it. */
  def rrf(rankings: Seq[(String, DataFrame)], idCol: String,
          k: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.size >= 2, "rrf: need at least two rankers")
    require(k >= 0 && topN > 0, s"rrf: invalid k=$k topN=$topN")
    val named = rankings.map { case (name, df) =>
      (name, df.select(col(idCol), col("rank").cast("long").as(s"rank_$name")))
    }
    val joined = named.map(_._2).reduce { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    val score = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf_score", round(score, 6))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topN)
  }

  /** Attach a deterministic 1-based `rank` to a scored top-N list:
    * score desc, then `idCol` asc — the tie-break every ranker in this
    * library already uses, re-stated as an explicit column so fusion
    * is a pure function of the ranked lists. The input is a bounded
    * top-N frame, so the single-partition window is over ≤ N rows. */
  def withRank(scored: DataFrame, scoreCol: String, idCol: String): DataFrame =
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
}

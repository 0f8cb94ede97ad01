package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** End-to-end pretraining-data preparation: the composition a corpus
  * actually runs — exact dedup → quality filter → language ID → token
  * accounting — as one declarative plan, so Catalyst sees every stage at
  * once (filters fuse, the scan is read once, nothing materializes
  * between stages).
  *
  * Scale shape: the only corpus-sized shuffle is the dedup groupBy.
  * Quality scoring, language ID, and token counting are row-local
  * codegen'd expressions applied AFTER dedup (never score a byte you are
  * about to throw away), and the final aggregate is partial→final over a
  * handful of language keys. At 100 TB, swap the full-text dedup key for
  * [[graft.text.TextAnalysis.fingerprint]] (8 bytes/doc instead of the
  * payload — same plan shape, see [[graft.dedup.Dedup]]).
  */
object TrainingData {

  /** Surviving documents: one copy per distinct text (lowest doc_id),
    * quality ≥ `minQuality`, confident language guess. */
  def prepare(documents: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val deduped = documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val scored = deduped
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .filter(col("quality") >= minQuality)
    TextAnalysis.withLangGuess(scored)
      .filter(col("lang_guess") =!= "und")
      .select("doc_id", "lang_guess", "n_tokens", "quality")
  }

  /** Weighted mixture construction: sample each source at its own rate
    * (e.g. "keep 100% of books, 30% of web") in ONE pass via seeded
    * per-stratum Bernoulli sampling (`sampleBy`) — no per-source jobs,
    * no shuffle; the sample decision is row-local. Deterministic for a
    * fixed seed, so mixtures are reproducible across re-runs. */
  def mixture(documents: DataFrame, weights: Map[String, Double],
              seed: Long = 42L): DataFrame =
    documents.stat.sampleBy("source", weights, seed)

  /** Per-language yield of the prepared corpus — the acceptance report a
    * data pipeline publishes per snapshot (docs kept, token budget,
    * mean quality). */
  def summary(documents: DataFrame, minQuality: Double = 0.5): DataFrame =
    prepare(documents, minQuality)
      .groupBy("lang_guess")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        round(avg("quality"), 6).as("avg_quality"))
      .orderBy("lang_guess")
}

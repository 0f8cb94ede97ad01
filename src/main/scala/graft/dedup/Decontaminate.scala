package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination — the GPT-3 appendix-C / PaLM procedure every
  * serious training-data pipeline runs: remove from the training corpus
  * any document sharing at least one `k`-token shingle with an
  * evaluation/benchmark set, so measured eval numbers are not memorized
  * leakage.
  *
  * Scale shape at 100 TB: the eval side is small and static — its
  * distinct shingle set is broadcast (at extreme eval sizes a Bloom
  * filter of the shingles, trading false-positive over-removal for
  * memory). The corpus side is one row-local shingle pass, a broadcast
  * LEFT SEMI join to collect contaminated doc_ids, and a broadcast
  * LEFT ANTI join to drop them. No corpus self-join and no
  * corpus-keyed wide shuffle at any point.
  */
object Decontaminate {

  /** doc_ids of training documents sharing ≥1 `k`-token shingle with
    * `evalDocs`. Shingles are the same distinct word-window construction
    * the MinHash path uses ([[Dedup.shingles]]); documents shorter than
    * `k` tokens contribute their whole text as one shingle, so
    * short-document exact dups are still caught. */
  def contaminatedIds(docs: DataFrame, evalDocs: DataFrame, k: Int = 8): DataFrame = {
    val evalSh = evalDocs
      .select(explode(Dedup.shingles(col("text"), k)).as("sh"))
      .distinct()
    docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("sh"))
      .join(broadcast(evalSh), "sh")
      .select("doc_id")
      .distinct()
  }

  /** The decontaminated training corpus. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, k: Int = 8): DataFrame =
    docs.join(broadcast(contaminatedIds(docs, evalDocs, k)), Seq("doc_id"), "left_anti")

  /** Per-language report: original vs kept vs dropped counts. */
  def report(docs: DataFrame, evalDocs: DataFrame, k: Int = 8): DataFrame = {
    val kept = decontaminate(docs, evalDocs, k)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy("lang")
  }
}

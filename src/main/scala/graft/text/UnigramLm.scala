package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level unigram language model and per-document log-probability
  * scoring — the statistical quality filter real pretraining pipelines
  * run after the heuristic trio (CCNet-style: documents whose tokens are
  * improbable under the corpus' own distribution are OCR garbage,
  * boilerplate, or the wrong register). A unigram model is deliberately
  * chosen over an n-gram one: it is one aggregate + one broadcast join,
  * fully declarative, and already separates junk from prose by orders of
  * magnitude in log-space.
  *
  * Scale shape: the token explode is the linear cost (rows × doc length,
  * same as every tokenizing pass here); model selection is top-`vocab`
  * by frequency via `orderBy(...).limit(...)` — a
  * `TakeOrderedAndProject`, never a full vocabulary sort; scoring joins
  * the exploded tokens to the BROADCAST model (vocab-sized, a few MB)
  * and aggregates back to one row per document. Out-of-vocabulary
  * tokens take a 0.5-count floor, so scores are total-ordered and never
  * −∞. */
object UnigramLm {

  /** Top-`vocabSize` cut of a (tok, cnt) frequency frame — count-desc,
    * token-asc, so the model boundary is deterministic. ONE definition
    * shared by [[unigramModel]] and [[scoreDocuments]]; a tie-break or
    * tokenizer change can never desynchronize the two. */
  private def modelCut(counts: DataFrame, vocabSize: Int): DataFrame =
    counts.orderBy(desc("cnt"), asc("tok")).limit(vocabSize)

  /** The model: top-`vocabSize` tokens by corpus frequency with their
    * counts. */
  def unigramModel(documents: DataFrame, vocabSize: Int = 1000): DataFrame =
    modelCut(
      documents
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt")),
      vocabSize)

  /** Per-document mean token log-probability under [[unigramModel]]:
    * `avg over tokens of ln(count(tok)/total)`, OOV floored at
    * `ln(0.5/total)`. Documents with zero tokens drop out (no
    * probability is defined for them — filter them with the length
    * rules first). Output: (doc_id, lang, n_tokens, avg_logp).
    *
    * The corpus total rides along as a lazy one-row broadcast crossJoin
    * (`sum(cnt)` over the pre-limit vocabulary aggregate — the same
    * scalar pattern as tfidf/baselineRatio), so constructing the plan
    * launches no jobs and empty input yields an empty result rather
    * than a driver error. */
  def scoreDocuments(documents: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val model = modelCut(counts, vocabSize)
    val total = counts.agg(sum("cnt").cast("double").as("_total"))
    toks
      .join(broadcast(model), Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("lang"),
        log(coalesce(col("cnt").cast("double"), lit(0.5)) / col("_total"))
          .as("lp"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), avg("lp").as("avg_logp"))
  }

  /** CCNet's selection step (Wenzek et al. 2020 §3.3): cut each
    * language's per-document LM score distribution into head / middle /
    * tail at the ⅓ and ⅔ quantiles and report the per-(lang, bucket)
    * census — the table a pipeline reads to keep head (+ middle) and
    * drop tail. Scores are rounded to 6 decimals BEFORE thresholding so
    * both the quantile inputs and the boundary comparisons are
    * float-noise-free across engines (ulp differences in a mean of logs
    * are ~1e-15; the rounding grid is 1e-6).
    *
    * Scale shape: thresholds are one language-keyed aggregation
    * (languages ≪ corpus) broadcast back — never a per-language window
    * over the corpus. The gate pins EXACT quantiles for oracle parity;
    * exact `percentile` buffers each language's score vector in the
    * aggregation buffer, so at 100 TB pass `exact = false` for the
    * fixed-size `approx_percentile` sketch (same two-pass shape — the
    * a12/a27 exact/approx twin convention).
    *
    * [[ccnetAssign]] returns the per-document assignment
    * (doc_id, lang, n_tokens, avg_logp, score, bucket) — the form a
    * downstream pipeline filters on; [[ccnetBuckets]] is its census. */
  def ccnetAssign(documents: DataFrame, vocabSize: Int = 1000,
                  exact: Boolean = true): DataFrame = {
    val scored = scoreDocuments(documents, vocabSize)
      .withColumn("score", round(col("avg_logp"), 6))
    def q(p: Double) =
      if (exact) percentile(col("score"), lit(p))
      else percentile_approx(col("score"), lit(p), lit(10000))
    val th = scored.groupBy("lang")
      .agg(q(1.0 / 3).as("_t1"), q(2.0 / 3).as("_t2"))
    scored.join(broadcast(th), "lang")
      .withColumn("bucket",
        when(col("score") <= col("_t1"), "tail")
          .when(col("score") <= col("_t2"), "middle")
          .otherwise("head"))
      .drop("_t1", "_t2")
  }

  def ccnetBuckets(documents: DataFrame, vocabSize: Int = 1000,
                   exact: Boolean = true): DataFrame =
    ccnetAssign(documents, vocabSize, exact)
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("score"), 4).as("mean_score"),
        sum("n_tokens").as("n_tokens"))
      .orderBy("lang", "bucket")
}

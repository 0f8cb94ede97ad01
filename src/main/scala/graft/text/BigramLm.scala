package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated bigram language model scoring — the n-gram upgrade of
  * [[UnigramLm]] (CCNet trains 5-gram KenLM models for exactly this
  * filter; a bigram with unigram interpolation captures most of the
  * junk/prose separation at a fraction of the state). Per token
  * position t ≥ 2 the probability is
  * `λ · c₂(prev,cur)/c₁(prev) + (1−λ) · c_uni(cur)/N`, with an
  * out-of-model bigram contributing 0 to the first term and the
  * unigram term floored at 0.5/N, so scores stay finite and
  * total-ordered.
  *
  * Scale shape: bigrams are formed ROW-LOCALLY from the token array
  * (an array transform — no window over the token stream, no
  * per-position shuffle); both models are top-K frequency cuts selected
  * via `TakeOrderedAndProject` (never a full vocabulary sort) and
  * BROADCAST to the scoring join; head counts `c₁` are computed once
  * over the bigram stream and semi-joined down to the model's heads
  * before broadcasting, so nothing vocabulary-sized ever sits on the
  * driver or in a broadcast beyond the chosen model size. */
object BigramLm {

  /** (prev, cur, bigram-string) structs, row-local; docs with fewer
    * than 2 tokens yield the empty array (the `sequence(1,0)` Spark
    * descending-sequence trap is guarded, same as
    * [[TextAnalysis.tokenWindows]]). */
  private def bigramStructs(text: org.apache.spark.sql.Column) = {
    val arr = TextAnalysis.tokens(text)
    when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1), i =>
        struct(element_at(arr, i).as("prev"),
          element_at(arr, i + 1).as("cur"),
          concat_ws(" ", element_at(arr, i), element_at(arr, i + 1)).as("bg"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string,bg:string>>"))
  }

  /** Per-language roll-up of per-document mean interpolated bigram
    * log-probability: (lang, n_docs, mean_logp, min_logp, max_logp).
    * Documents with fewer than 2 tokens drop out (no bigram is
    * defined). */
  def scoreByLang(documents: DataFrame, bigramVocab: Int = 2000,
                  unigramVocab: Int = 1000, lambda: Double = 0.7): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val uniCounts = toks.groupBy("tok").agg(count(lit(1)).as("ucnt"))
    val uniModel = uniCounts.orderBy(desc("ucnt"), asc("tok")).limit(unigramVocab)
    val uniTotal = uniCounts.agg(sum("ucnt").cast("double").as("_n"))

    // ONE tokenize+bigram explode for both the model count and the
    // scoring pass — persisted, consumed twice, released after the
    // eager materialization below
    val bgs = documents
      .select(col("doc_id"), col("lang"),
        explode(bigramStructs(col("text"))).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.prev").as("prev"), col("b.cur").as("cur"), col("b.bg").as("bg"))
      .persist()
    val bgCounts = bgs.groupBy("bg").agg(count(lit(1)).as("bcnt"))
    val bgModel = bgCounts.orderBy(desc("bcnt"), asc("bg")).limit(bigramVocab)
    // c₁ = occurrences as a bigram HEAD (token count minus doc-final
    // positions). Derived by re-aggregating the DISTINCT-BIGRAM count
    // table (vocabulary-sized) by head — NOT by a second explode of the
    // corpus: Σ bcnt over a head's bigrams is the same number, for a
    // pass over thousands of rows instead of billions. Restricted to
    // heads the model can ever ask for before broadcasting.
    val headCounts = bgCounts
      .groupBy(split(col("bg"), " ").getItem(0).as("prev"))
      .agg(sum("bcnt").as("hcnt"))
      .join(broadcast(bgModel.select(split(col("bg"), " ")
        .getItem(0).as("prev")).distinct()), Seq("prev"), "left_semi")

    try {
      bgs
        .join(broadcast(bgModel), Seq("bg"), "left")
        .join(broadcast(headCounts), Seq("prev"), "left")
        .join(broadcast(uniModel.withColumnRenamed("tok", "cur")),
          Seq("cur"), "left")
        .crossJoin(broadcast(uniTotal))
        .select(col("doc_id"), col("lang"),
          log(lit(lambda)
              * coalesce(col("bcnt").cast("double") / col("hcnt"), lit(0.0))
            + lit(1.0 - lambda)
              * coalesce(col("ucnt").cast("double"), lit(0.5)) / col("_n"))
            .as("lp"))
        .groupBy("doc_id", "lang")
        .agg(avg("lp").as("avg_logp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("avg_logp"), 4).as("mean_logp"),
          round(min("avg_logp"), 4).as("min_logp"),
          round(max("avg_logp"), 4).as("max_logp"))
        .orderBy("lang")
        // eager: the languages-sized result materializes while the
        // explode is still cached; callers get a plan with no corpus
        // dependency at all
        .localCheckpoint(true)
    } finally { bgs.unpersist(); () }
  }
}

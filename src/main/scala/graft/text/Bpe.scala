package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table training (Sennrich, Haddow & Birch
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909 §3.2), the distributed way: train on the WORD
  * FREQUENCY table, never the corpus. One corpus-sized aggregation
  * builds `(word, freq)`; every merge round is then (a) one
  * partial→final pair-count aggregation over the vocabulary-sized word
  * table, (b) a 1-row `TakeOrderedAndProject` collect of the argmax
  * pair, (c) a row-local merge of that pair in every word. Per-round
  * shuffle volume is the DISTINCT PAIR table (≤ symbols², practically
  * ~vocab·avg_word_len rows), independent of corpus size; driver state
  * is one (pair, count) row per round.
  *
  * Word-state representation: a word's symbol sequence is kept as a
  * single string with every symbol carrying its OWN boundary spaces —
  * symbols joined by TWO spaces, one sentinel space at each end
  * (`" l  o  w "`). Merging pair `(a, b)` is then the literal string
  * replace of `" a  b "` with `" ab "`: because adjacent symbols never
  * share a delimiter character, left-to-right non-overlapping replace
  * reproduces the classical BPE run semantics exactly (`" a  a  a  a "`
  * → `" aa  aa "`, the `(aa)(aa)` segmentation subword-nmt produces —
  * a SINGLE shared space would be consumed by the first match and the
  * run would stall at one merge). String replace is the same
  * non-overlapping scan in every SQL engine, so the oracle mirrors
  * every round with `replace()` instead of a stateful loop.
  *
  * Tie-break: highest count, then lexicographically smallest pair —
  * pinned so the merge table is deterministic cross-engine.
  */
object Bpe {

  /** One learned merge: the pair chosen at `step` (1-based), the merged
    * symbol it produces, and the weighted pair count that won. */
  final case class Merge(step: Int, pair: String, merged: String,
                         pair_count: Long)

  /** space-filtered symbol array of the delimited state string */
  private def symbolsOf(s: Column): Column =
    filter(split(s, " "), t => length(t) > 0)

  /** adjacent symbol pairs as "a b" strings — zip of shifted slices,
    * O(1) state-string evaluations per word */
  private def pairsOf(s: Column): Column = {
    val arr = symbolsOf(s)
    val n = size(arr)
    when(n >= 2,
      zip_with(slice(arr, lit(1), n - 1), slice(arr, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** The word-frequency table with the initial character-level symbol
    * state: `(word, freq, s)`. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("s", concat(lit(" "),
        array_join(filter(split(col("word"), ""), c => length(c) > 0), "  "),
        lit(" ")))

  /** Train `nMerges` rounds; returns the merge table and the word table
    * in its FINAL symbol state (for encoding/inspection). The returned
    * word DataFrame still references the persisted base — callers that
    * materialize it pay only the replace chain. */
  def train(docs: DataFrame, nMerges: Int = 10,
            textCol: String = "text"): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val words = wordTable(docs, textCol).persist()
    try {
      var cur = words
      val merges = (1 to nMerges).map { r =>
        val top = cur
          .select(col("freq"), explode(pairsOf(col("s"))).as("pr"))
          .groupBy("pr").agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), asc("pr")).limit(1)
          .collect()
        require(top.nonEmpty,
          s"bpe: no adjacent pairs left after ${r - 1} merges")
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val merged = pair.replace(" ", "")
        val pattern = " " + pair.replace(" ", "  ") + " "
        cur = cur.withColumn("s",
          replace(col("s"), lit(pattern), lit(s" $merged ")))
        Merge(r, pair, merged, cnt)
      }
      // eagerly settle the final state while the base is cached, then
      // release — the caller's DataFrame carries no persist dependency
      val settled = cur.localCheckpoint(true)
      (merges, settled)
    } finally { words.unpersist(); () }
  }

  /** The merge table as a DataFrame (step, pair, merged, pair_count) —
    * the gate surface. */
  def mergeTable(docs: DataFrame, nMerges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, nMerges)._1.toDF().orderBy("step")
  }

  /** Apply an already-learned merge table to a NEW corpus — the
    * inference half of the tokenizer: build the target's word-frequency
    * table, replay the merges in training order (each one the same
    * row-local two-space-delimited replace used in training), and
    * return `(word, freq, symbols)` with the final subword segmentation.
    * The merge table is a driver-side `Seq` (N rows — the model), so
    * the replay is a pure projection chain: zero joins, zero extra
    * shuffles beyond the one word-count aggregation. */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val encoded = merges.sortBy(_.step).foldLeft(wordTable(docs, textCol)) {
      (df, m) =>
        df.withColumn("s", replace(col("s"),
          lit(" " + m.pair.replace(" ", "  ") + " "), lit(s" ${m.merged} ")))
    }
    encoded.select(col("word"), col("freq"), symbolsOf(col("s")).as("symbols"))
  }

  /** Corpus-weighted symbol frequencies AFTER the learned merges — the
    * encoded-output pin: top `topK` symbols by `(count desc, symbol)`.
    * Shows merged subwords overtaking raw characters. */
  def encodedSymbolCounts(docs: DataFrame, nMerges: Int = 10,
                          topK: Int = 20): DataFrame =
    train(docs, nMerges)._2
      .select(col("freq"), explode(symbolsOf(col("s"))).as("symbol"))
      .groupBy("symbol").agg(sum("freq").as("cnt"))
      .orderBy(desc("cnt"), asc("symbol")).limit(topK)
}

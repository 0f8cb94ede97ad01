package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication — the ExactSubstr pass of Lee et
  * al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499 §4.1), re-expressed at token-shingle
  * granularity for a distributed engine. The reference pass builds a
  * suffix array over the whole corpus and removes every ≥50-token span
  * that appears twice anywhere; the distributed shape used here is the
  * sorted-k-gram index real pipelines substitute at cluster scale:
  *
  *   1. every k-token shingle posts `(shingle, doc, pos)` — one
  *      row-local explode, the corpus-sized pass;
  *   2. shingles occurring ≥2 times corpus-wide (ANY two occurrences,
  *      same doc or not — a self-repeat is a duplicated span too) are
  *      the duplicated k-grams: one partial→final count on the shingle
  *      key, the only corpus-wide shuffle;
  *   3. each doc's duplicated positions merge into MAXIMAL SPANS
  *      (gaps-and-islands over positions: a new island starts when the
  *      next duplicated position is > k past the previous one, i.e. the
  *      token intervals no longer touch) — a per-document window,
  *      bounded by document length, never corpus size.
  *
  * The result is the CUT LIST: `(doc_id, span_start, span_end,
  * span_len)` in 1-based token indices, exactly what the removal step
  * consumes. Losing suffix-array maximality costs only span-boundary
  * granularity (spans snap to shingle positions); the k-gram index
  * keeps every duplicated region ≥ k tokens, which is the Lee et al.
  * threshold semantics with k as the threshold.
  *
  * Scale shape: nothing is all-pairs — step 2's HAVING count ≥ 2 is a
  * hash aggregation; step 3's semi-join back to postings shuffles on
  * the shingle key like any equi-join (a Bloom filter over duplicated
  * shingles can pre-trim the probe side at extreme scale, same pattern
  * as [[graft.operators.BloomJoin]]). Window state in step 3 is one
  * doc's duplicated positions.
  */
object ExactSubstr {

  /** Positional k-shingles via zipped shifted slices (the tokenizer
    * evaluates O(k) times per doc — see [[Dedup.shingles]] for why not
    * per-position `element_at`). Returns the shingle ARRAY in position
    * order; `posexplode` upstream supplies 0-based positions. */
  private def positionalShingles(text: Column, k: Int): Column = {
    val toksC = filter(split(text, " "), t => length(t) > 0)
    val n = size(toksC)
    val first = slice(toksC, lit(1), n - (k - 1))
    val joined = (1 until k).foldLeft(first) { (acc, j) =>
      zip_with(acc, slice(toksC, lit(j + 1), n - (k - 1)),
        (a, b) => concat(a, lit(" "), b))
    }
    when(n >= k, joined).otherwise(array().cast("array<string>"))
  }

  /** The duplicated-span cut list: every maximal token span of `docs`
    * whose k-shingles ALL occur at least twice corpus-wide. Output:
    * `(doc_id, span_start, span_end, span_len)`, token indices 1-based
    * inclusive, ordered by `(doc_id, span_start)`. */
  def duplicatedSpans(docs: DataFrame, k: Int = 8): DataFrame =
    spansUnordered(docs, k).orderBy("doc_id", "span_start")

  /** [[duplicatedSpans]] WITHOUT the output ordering — the internal
    * form [[stripSpans]]/[[cutProfile]] consume: both re-aggregate or
    * re-sort downstream, so the cut list's global sort would be a pure
    * extra exchange+sort in their plans (r13 measurement). */
  private def spansUnordered(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"shingle width must be >= 2 tokens, got $k")
    val postings = docs
      .select(col("doc_id"),
        posexplode(positionalShingles(col("text"), k)).as(Seq("_p0", "shingle")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"),
        col("shingle"))
    val dup = postings.groupBy("shingle")
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("shingle")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    postings
      .join(dup, Seq("shingle"), "left_semi")
      // islands: break when this duplicated position no longer touches
      // the previous one's k-token interval (first row: lag is null →
      // comparison null → otherwise(0), island 0 starts the doc)
      .withColumn("_brk",
        when(col("pos") - lag("pos", 1).over(w) > k, 1).otherwise(0))
      .withColumn("_island", sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "_island")
      .agg(min("pos").as("span_start"),
        (max("pos") + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** APPLY the cut list: remove every token covered by a duplicated
    * span and rebuild the surviving text — the destructive half of the
    * ExactSubstr pass (Lee et al. 2021 §4.1 removes the repeated span
    * itself, keeping one-off text). Returns one row per AFFECTED doc:
    * `(doc_id, n_before, n_after, clean_text)` (a fully-duplicated doc
    * comes back with `n_after = 0` and empty text — the row is the
    * evidence the doc should drop entirely).
    *
    * Scale shape: covered positions explode one row per CUT TOKEN —
    * bounded by corpus duplication mass, not corpus size; the
    * keep-filter is a left-anti equi-join on `(doc_id, pos)`; the text
    * rebuild is a per-document sort-free aggregation (positions ride in
    * a struct, `array_sort` orders each doc's survivors locally). */
  def stripSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    // unordered + LAZY checkpoint: the cut list feeds two consumers
    // (covered-position explode + affected-doc distinct), so without
    // the cache the whole postings→dup→window pipeline runs twice —
    // and it is cut-list-sized (bounded by duplication mass), so
    // caching it is cheap at any scale
    val spans = spansUnordered(docs, k).localCheckpoint(eager = false)
    // spans of one doc are disjoint by construction (islands split on
    // gap > k, so consecutive spans are separated by ≥1 uncovered
    // position) — no dedup needed after the explode
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = docs.select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), t => length(t) > 0))
          .as(Seq("_p0", "tok")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"),
        col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_after"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    val before = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => length(t) > 0))
        .cast("long").as("n_before"))
    spans.select("doc_id").distinct()
      .join(before, "doc_id")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Per-document duplication budget from the cut list: how many tokens
    * the removal step would cut, per doc that has any — the accounting
    * number a dedup job publishes before destructive removal. */
  def cutProfile(docs: DataFrame, k: Int = 8): DataFrame =
    spansUnordered(docs, k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("span_len").as("dup_tokens"),
        max("span_len").as("max_span"))
      .orderBy("doc_id")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn an event log of
  * attribute observations into versioned validity intervals — the curated
  * "dimension with history" table a warehouse keeps next to the fact
  * stream (the reference keeps only current-state dimensions — the TLC
  * zone lookup; this is the standard extension when a dimension's
  * attributes drift month to month).
  *
  * Semantics: events are ordered per key by `(tsCol, tiebreakCol)`;
  * consecutive events whose tracked attributes are unchanged open NO new
  * version (null-safe struct compare); each surviving event opens a
  * version valid from its timestamp until the next version's timestamp
  * (`valid_to` null while current).
  *
  * Plan shape: ONE shuffle on the key feeds both window passes — the
  * change-collapse lag and the interval lead run over the same
  * `(key)×(ts, tiebreak)` spec, and the second window sees rows already
  * hash-partitioned by the key, so Catalyst plans Exchange once. Per-key
  * width is the entity's OBSERVATION count (bounded by dimension churn,
  * not corpus size), so the per-key sort holds at 100 TB fact scale —
  * dimension logs are the small, churn-bounded side. A key whose raw
  * observation log itself is pathological routes through the same
  * chunk-and-carry pattern as [[Windows.sessionizeChunked]].
  */
object Scd2 {

  /** CONTRACT: `tiebreakCol` must be unique per key (it disambiguates
    * same-timestamp observations; a duplicate tiebreak would make the
    * version ordering nondeterministic). Output: one row per version —
    * `key, version (1-based), attrCols…, valid_from, valid_to,
    * is_current`. */
  def build(log: DataFrame, key: String, tsCol: String,
            attrCols: Seq[String], tiebreakCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2: attrCols must be non-empty")
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tiebreakCol))
    val payload = struct(attrCols.map(col): _*)
    val changed = log
      .select(col(key) +: col(tsCol) +: col(tiebreakCol) +: attrCols.map(col): _*)
      .withColumn("_prev", lag(payload, 1).over(w))
      // first observation per key, or any tracked attribute changed
      .filter(col("_prev").isNull || !(payload <=> col("_prev")))
      .drop("_prev")
    changed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol, tiebreakCol)
  }

  /** Point-in-time lookup against a built history: the dimension row
    * version in effect at `asOf` per key — `valid_from <= asOf <
    * valid_to` (current rows have open `valid_to`). A filter, not a
    * join: pushable straight into the history scan — the probe literal
    * is cast to the column's type (TIMESTAMP or the fixtures'
    * TIMESTAMP_NTZ; exact under the pinned UTC session) so the COLUMN
    * stays bare and the predicate reaches the parquet footer. */
  def asOf(history: DataFrame, asOfTs: java.sql.Timestamp): DataFrame = {
    val probe = lit(asOfTs).cast(history.schema("valid_from").dataType)
    history.filter(col("valid_from") <= probe &&
      (col("valid_to").isNull || col("valid_to") > probe))
  }

  /** Late-arriving-observation repair WITHOUT a full rebuild: rebuild
    * only the keys the late batch touches (their observation slice of
    * `log` plus the late rows through the same [[build]]), keep every
    * other key's history rows untouched via an anti-join. Per-key
    * independence of [[build]] makes this EXACTLY equivalent to
    * `build(log ∪ late)` — the u8 gate pins that equality against a
    * full-rebuild oracle. The key joins are NULL-SAFE (`<=>`): [[build]]
    * treats a NULL key as a real partition (`Window.partitionBy` groups
    * NULLs), so a null-key late row must select the old null-key
    * observations into the rebuild and evict the old null-key history
    * rows exactly like any other key — plain equality would rebuild
    * from the late slice alone while the stale rows survive the
    * anti-join, duplicating versions.
    *
    * Scale shape: the late batch is small, so its key set broadcasts
    * into both the semi-join (select affected observations) and the
    * anti-join (protect untouched history); only affected keys pay the
    * window sort again. This is the SCD2 analog of
    * [[SnapshotDiff.incrementalAggUpdate]]'s "touch only the changeset"
    * discipline. */
  def mergeLate(history: DataFrame, log: DataFrame, late: DataFrame,
                key: String, tsCol: String, attrCols: Seq[String],
                tiebreakCol: String): DataFrame = {
    val affected = late.select(col(key).as("_graft_k")).distinct()
    val rebuilt = build(
      log.join(broadcast(affected), col(key) <=> col("_graft_k"), "left_semi")
        .unionByName(late.select(log.columns.map(col): _*)),
      key, tsCol, attrCols, tiebreakCol)
    history.join(broadcast(affected), col(key) <=> col("_graft_k"), "left_anti")
      .unionByName(rebuilt)
  }

  /** Retention pruning: drop history versions that ENDED before the
    * cutoff and clamp the covering version's `valid_from` up to it —
    * the GDPR/retention compaction that keeps every as-of query at or
    * after the cutoff answering EXACTLY as before (the u9 gate pins
    * that equivalence), while history mass before it is gone. Pure
    * row-local filter + projection on the (churn-bounded) history
    * table; `version` is re-numbered per key so consumers see a dense
    * sequence. */
  def pruneBefore(history: DataFrame, cutoff: java.sql.Timestamp,
                  key: String): DataFrame = {
    val c = lit(cutoff).cast(history.schema("valid_from").dataType)
    val kept = history.filter(col("valid_to").isNull || col("valid_to") > c)
      .withColumn("valid_from", greatest(col("valid_from"), c))
    val w = Window.partitionBy(key).orderBy("valid_from")
    kept.withColumn("version", row_number().over(w))
  }

  /** Temporal dimension join: each fact row picks the dimension version
    * in effect at ITS OWN timestamp — the join a fact stream runs
    * against a [[build]]-produced history so late-arriving or
    * reprocessed facts see period-correct attributes, not
    * current-state ones.
    *
    * Plan shape: an equi-join on the key with the validity interval as
    * a residual predicate — the shuffle is keyed exactly like any fact
    * join, and the residual scans each key's version list, whose length
    * is dimension churn (a handful), never fact volume. Because each
    * fact timestamp lands in exactly one half-open `[valid_from,
    * valid_to)` interval, the join is one-to-at-most-one by
    * construction. Facts dated before their key's first version (or
    * with no key match) are dropped (inner join). */
  def joinAsOf(facts: DataFrame, history: DataFrame, key: String,
               tsCol: String): DataFrame =
    facts.join(history,
      facts(key) === history(key) &&
        facts(tsCol) >= history("valid_from") &&
        (history("valid_to").isNull || facts(tsCol) < history("valid_to")))
      .drop(history(key))
}

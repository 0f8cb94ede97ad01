package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark has no builtin
  * for. Composed from existing operators per the engine's preference
  * order: tag both sides, `unionByName`, and per key take the running
  * `last(..., ignoreNulls)` of the right side's payload ordered by
  * (ts, side, tiebreak).
  *
  * Scale shape: ONE shuffle on the key (the union sorts within key
  * partitions), versus the naive `left.join(right, r.ts <= l.ts)` +
  * max-per-row formulation, which is a range join that degenerates to
  * per-key cross products. Window state is O(1) per partition (running
  * last), so arbitrarily long histories stream through. */
object AsOfJoin {

  /** For each `left` row, attach the payload of the latest `right` row
    * with `right.ts <= left.ts` and the same `key`. `tiebreak` must be
    * unique per row (keeps ordering engine-independent).
    * Right-side payload columns come back null when no prior row
    * exists. NOTE: right rows whose payload is null are skipped, not
    * treated as observations — each payload column independently takes
    * the latest NON-NULL value (matches the oracle's IGNORE NULLS). */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           tiebreak: String, payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
      Seq(col(key), col(tsCol), col(tiebreak), lit(0).as("_side")) ++
        payloadCols.map(c => col(c).as(s"asof_$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts ⇒ a right
    // row at exactly left.ts is visible to it ("<=" semantics)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withPayload = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Hot-key-safe backward as-of — the chunk-and-carry form of [[asOf]]
    * for the per-key-ordered serialization (same motivation as
    * [[Windows.sessionizeChunked]]): a single key with billions of rows
    * otherwise sorts its whole timeline on one task.
    *
    * Three stages, none of which orders a full key timeline in one task:
    *   1. local pass — the [[asOf]] running `last(ignoreNulls)` windowed
    *      over (key, time-chunk), parallel across a hot key's chunks;
    *   2. carry computation — per (key, chunk) the chunk's LAST non-null
    *      raw payload per column (one `max_by` aggregate over the raw
    *      union — no dependence on the windowed pass), then a per-key
    *      running last over the chunk summaries EXCLUSIVE of the current
    *      chunk. The serialized window sees O(chunks) rows per key, not
    *      O(events);
    *   3. stitch — each left row takes its local value, falling back to
    *      the carry-in from earlier chunks (`coalesce`).
    *
    * Exactly [[asOf]]: a non-null in-chunk predecessor is strictly later
    * than anything in earlier chunks (local wins correctly), and when the
    * local value is null the latest non-null lives in a prior chunk —
    * which is precisely the exclusive carry. Per-column independence is
    * preserved (each payload column coalesces separately).
    *
    * The returned plan is LAZY and fully recomputable (no persist, no
    * checkpoint): executor loss recomputes instead of failing — the
    * property an operator aimed at real clusters needs. The price is
    * that stages 1 and 2 each shuffle the union on (key, chunk) — two
    * shuffles per action where the former persist-based form paid one
    * plus a cache materialization (measured FASTER lazy at gate scale:
    * the independent stages overlap within one action). Callers
    * replaying the result across many actions should `persist()` it —
    * and own the unpersist — rather than re-pay both shuffles.
    *
    * `tiebreak` must be unique per (key, ts) — the same assumption
    * [[asOf]] makes for engine-independent ordering, and here the carry
    * `max_by` aggregates on it: tied order keys would make the chunk-
    * final payload nondeterministic run-to-run. */
  def asOfChunked(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                  tiebreak: String, payloadCols: Seq[String],
                  chunkHours: Int = 24): DataFrame =
    chunkAndCarry(left, right, key, tsCol, tiebreak, payloadCols, chunkHours,
      backward = true)

  /** Hot-key-safe FORWARD as-of — [[asOfForward]] in the same
    * chunk-and-carry shape as [[asOfChunked]], mirrored in time: the
    * local pass runs the forward window within (key, time-chunk); the
    * carry is each chunk's FIRST non-null raw payload (`min_by` over the
    * order key, payload-bearing rows only), carried per key by a
    * `first(ignoreNulls)` window EXCLUSIVE of the current chunk over the
    * FOLLOWING chunk summaries; the stitch coalesces the local value
    * with the carry-in from later chunks. Same guarantees and trade as
    * [[asOfChunked]]: lazy, fully recomputable, O(chunks) serialized
    * rows per key, `tiebreak` unique per (key, ts). */
  def asOfForwardChunked(left: DataFrame, right: DataFrame, key: String,
                         tsCol: String, tiebreak: String,
                         payloadCols: Seq[String],
                         chunkHours: Int = 24): DataFrame =
    chunkAndCarry(left, right, key, tsCol, tiebreak, payloadCols, chunkHours,
      backward = false)

  /** Shared chunk-and-carry body for both directions. Every
    * direction-dependent token lives here, named, so a fix to the carry
    * algebra cannot silently reach one direction only (the 5-seed
    * property spec pins both against their plain forms):
    *   - backward: left rows are side 1 (right-at-equal-ts visible),
    *     payload prefix `asof_`, local window = running `last` over
    *     preceding rows, chunk summary = LAST non-null raw payload
    *     (`max_by`), carry = running `last` over PRECEDING chunks;
    *   - forward: left rows are side 0, prefix `asofnext_`, `first`
    *     over following rows, FIRST non-null raw payload (`min_by`),
    *     `first` over FOLLOWING chunks. */
  private def chunkAndCarry(left: DataFrame, right: DataFrame, key: String,
                            tsCol: String, tiebreak: String,
                            payloadCols: Seq[String], chunkHours: Int,
                            backward: Boolean): DataFrame = {
    require(chunkHours >= 1, s"chunkHours must be >= 1, got $chunkHours")
    val chunkMs = chunkHours * 3600000L
    val leftSide = if (backward) 1 else 0
    val prefix = if (backward) "asof_" else "asofnext_"
    def edgeValue(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val l = left.withColumn("_side", lit(leftSide))
    val r = right.select(
      Seq(col(key), col(tsCol), col(tiebreak), lit(1 - leftSide).as("_side")) ++
        payloadCols.map(c => col(c).as(s"$prefix$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_chunk",
        floor(unix_millis(col(tsCol).cast("timestamp")) / chunkMs))
    val ordered = Window.partitionBy(col(key), col("_chunk"))
      .orderBy(col(tsCol), col("_side"), col(tiebreak))
    val wLocal =
      if (backward) ordered.rowsBetween(Window.unboundedPreceding, 0)
      else ordered.rowsBetween(0, Window.unboundedFollowing)
    val localized = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"$prefix$c", edgeValue(col(s"$prefix$c"), wLocal))
    }
    // chunk-edge value per payload column, straight from the raw union:
    // the last (backward) / first (forward) non-null raw payload in the
    // chunk (max_by/min_by over the order key, restricted to
    // payload-bearing rows — both skip rows whose ordering expression is
    // null) equals the windowed value at the chunk's edge row, without
    // reusing the windowed frame.
    val ord = struct(col(tsCol), col("_side"), col(tiebreak))
    def finAgg(c: String) = {
      val guarded = when(col(s"$prefix$c").isNotNull, ord)
      (if (backward) max_by(col(s"$prefix$c"), guarded)
       else min_by(col(s"$prefix$c"), guarded)).as(s"fin_$c")
    }
    val summaries = u.groupBy(col(key), col("_chunk"))
      .agg(finAgg(payloadCols.head), payloadCols.tail.map(finAgg): _*)
    val chunkOrdered = Window.partitionBy(key).orderBy("_chunk")
    val wCarry =
      if (backward) chunkOrdered.rowsBetween(Window.unboundedPreceding, -1)
      else chunkOrdered.rowsBetween(1, Window.unboundedFollowing)
    val carry = payloadCols.foldLeft(summaries) { (df, c) =>
      df.withColumn(s"carry_$c", edgeValue(col(s"fin_$c"), wCarry))
    }.select(col(key) :: col("_chunk") ::
      payloadCols.toList.map(c => col(s"carry_$c")): _*)
    val stitched = localized.filter(col("_side") === leftSide)
      .join(carry, Seq(key, "_chunk"), "left")
    payloadCols.foldLeft(stitched) { (df, c) =>
      df.withColumn(s"$prefix$c",
        coalesce(col(s"$prefix$c"), col(s"carry_$c")))
        .drop(s"carry_$c")
    }.drop("_side", "_chunk")
  }

  /** Forward as-of: for each `left` row, the payload of the EARLIEST
    * `right` row with `right.ts >= left.ts` and the same `key` — the
    * "next reading after" direction (e.g. first heartbeat after an
    * alarm). Same one-shuffle union-and-running-window shape as [[asOf]]
    * with the frame reversed: right rows sort AFTER left rows at equal
    * ts, and the window takes the first right payload at-or-after the
    * current row. Null payloads are skipped, as in [[asOf]]. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                  tiebreak: String, payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(0))
    val r = right.select(
      Seq(col(key), col(tsCol), col(tiebreak), lit(1).as("_side")) ++
        payloadCols.map(c => col(c).as(s"asofnext_$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // left rows (side 0) sort before right rows at equal ts ⇒ a right
    // row at exactly left.ts is visible to it (">=" semantics)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_side"), col(tiebreak))
      .rowsBetween(0, Window.unboundedFollowing)
    val withPayload = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asofnext_$c", first(col(s"asofnext_$c"), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 0)
      .drop("_side")
  }
}

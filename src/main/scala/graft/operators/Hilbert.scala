package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout key — the space-filling curve with
  * strictly better locality than [[ZOrder]]'s Morton key: consecutive
  * curve positions are ALWAYS adjacent cells (Morton jumps across the
  * plane at quadrant boundaries), so range-partitioned files cover
  * tighter rectangles and min/max pruning discards more files for the
  * same query box. This is the layout Amazon Redshift and recent
  * Iceberg/Delta work prefer over Z-order for high-selectivity 2-D
  * predicates (Hamilton, "Compact Hilbert Indices", 2006 is the
  * general-N reference; the 2-D form below is the classic xy2d walk).
  *
  * The conversion is the standard quadrant-fold: inspect one bit of
  * each coordinate per level (high to low), accumulate the quadrant's
  * curve offset, and reflect/transpose the lower bits into the
  * quadrant's frame. Per row it is `bits` rounds of shifts, masks, and
  * two conditional swaps — all literal integer arithmetic on codegen'd
  * Columns (no UDF), free at 100 TB and exactly reproducible by any
  * engine with integer ops, which is how the gate pins it against a
  * SQL oracle unrolled from the same recurrence.
  */
object Hilbert {

  /** Curve position of (`x`, `y`) on the order-`bits` Hilbert curve.
    * Inputs must be non-negative and < 2^bits; `2·bits` < 63.
    *
    * The reflection complements within the FULL grid (`n−1 − x`, n =
    * 2^bits), exactly as the classic xy2d loop does — at level i the
    * coordinate still carries its unconsumed bit i, so the level-local
    * form `s−1−x` would go negative and the two engines would then
    * disagree on negative shift/mod semantics. `n−1−x` keeps both
    * coordinates in [0, n) at every level. */
  def hilbertKey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits < 63, s"bits out of range: $bits")
    val n = 1L << bits
    val init = (x.cast("long"), y.cast("long"), lit(0L))
    val (_, _, d) = (bits - 1 to 0 by -1).foldLeft(init) {
      case ((cx, cy, acc), i) =>
        val s = 1L << i
        val rx = shiftrightunsigned(cx, i).bitwiseAND(lit(1L))
        val ry = shiftrightunsigned(cy, i).bitwiseAND(lit(1L))
        val acc2 = acc + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
        // rotate the lower bits into this quadrant's frame:
        // ry=0,rx=1 → point-reflect, then ry=0 → transpose (swap x,y)
        val fx = when(rx === 1, lit(n - 1) - cx).otherwise(cx)
        val fy = when(rx === 1, lit(n - 1) - cy).otherwise(cy)
        val nx = when(ry === 0, fy).otherwise(cx)
        val ny = when(ry === 0, fx).otherwise(cy)
        (nx, ny, acc2)
    }
    d
  }

  /** Plain-Scala reference of the identical recurrence (spec oracle —
    * the Column form above must agree cell-for-cell). */
  def hilbertKey2Ref(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >>> i) & 1L
      val ry = (y >>> i) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }

  /** The same unrolled recurrence as ANSI SQL (the DuckDB oracle is
    * GENERATED from this so engine and oracle can never drift on the
    * fold's shape): one chained CTE stage per level, carrying
    * (x, y, d) plus the caller's pass-through columns. The xor in the
    * quadrant offset is expanded arithmetically — for rx, ry ∈ {0,1},
    * (3·rx) ⊕ ry = 3·rx + ry − 2·rx·ry — so the text is portable to
    * any dialect with `//` integer division, no bit builtins needed. */
  def hilbertSql2(xExpr: String, yExpr: String, bits: Int,
                  fromClause: String, passThrough: String): String = {
    require(bits >= 1 && 2 * bits < 63, s"bits out of range: $bits")
    val n = 1L << bits
    val stages = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val rx = s"((x // $s) % 2)"
      val ry = s"((y // $s) % 2)"
      s"""h${k + 1} AS (SELECT
            CASE WHEN $ry = 0 THEN
              CASE WHEN $rx = 1 THEN ${n - 1} - y ELSE y END
            ELSE x END AS x,
            CASE WHEN $ry = 0 THEN
              CASE WHEN $rx = 1 THEN ${n - 1} - x ELSE x END
            ELSE y END AS y,
            d + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS d,
            $passThrough
          FROM h$k)"""
    }
    s"""h0 AS (SELECT $xExpr AS x, $yExpr AS y, 0 AS d, $passThrough
          $fromClause),
        ${stages.mkString(",\n        ")}"""
  }
}

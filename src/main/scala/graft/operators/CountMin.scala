package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Count-min sketch (Cormode & Muthukrishnan 2005): frequency estimation
  * over a key of ANY cardinality in `depth × width` counters — the
  * bounded-state scale twin of an exact `groupBy(key).count()` the same
  * way the HLL twins bound `countDistinct`. Estimates never
  * underestimate; the overestimate is ≤ ⌈e·N/width⌉ with probability
  * 1 − e^(−depth) (the d1/pr1-style exact paths stay the oracle tier;
  * this is the tier that still works when the key has billions of
  * distinct values and the exact map no longer fits anywhere).
  *
  * Scale shape: the build explodes each row into `depth` (row, d) pairs
  * — width-bounded MAP-SIDE combine collapses them to ≤ depth·width
  * counter rows before the exchange, so reducer state is constant in
  * corpus size. Sketches are ADDITIVE (counter-wise sum — the merge
  * spec pins half+half ≡ whole), so partial sketches from shards/days
  * roll up without rescanning. Probing joins the (tiny, broadcast)
  * sketch to the probe keys and takes the min counter per key. Hashing
  * is `fnv1a32(d ":" key)` — deterministic and replayable in the
  * oracle, row-local codegen.
  */
object CountMin {

  private def bucketOf(d: Column, key: Column, width: Int): Column =
    pmod(HashExpressions.fnv1a32(concat_ws(":", d, key)),
      lit(width.toLong)).cast("int")

  /** Build the sketch: one row per non-empty counter,
    * `(d, bucket, cnt)`. Null keys are skipped (they have no
    * frequency). */
  def build(df: DataFrame, key: Column, depth: Int = 4,
            width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0,
      s"count-min: depth/width must be positive, got $depth×$width")
    df.select(key.cast("string").as("_k"))
      .filter(col("_k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"), col("_k"))
      .groupBy(col("d"), bucketOf(col("d"), col("_k"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Counter-wise sum of sketches built with the SAME (depth, width) —
    * the shard/day rollup. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for a probe-key frame: `(key, est)` where `est` is
    * the min counter across depths — ≥ the true count always, and tight
    * unless the key collides in every row. The sketch broadcasts (it is
    * ≤ depth·width rows by construction); absent counters read 0. */
  def estimate(sketch: DataFrame, probes: DataFrame, key: Column,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0,
      s"count-min: depth/width must be positive, got $depth×$width")
    probes.select(key.cast("string").as("_k")).distinct()
      .select(col("_k"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", bucketOf(col("d"), col("_k"), width))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("_k").as("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

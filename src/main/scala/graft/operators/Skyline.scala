package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) query: the rows not dominated by any other
  * row — `q` dominates `p` when `q.x ≥ p.x ∧ q.y ≥ p.y` with at least
  * one strict. The classic multi-criteria OLAP operator ("cheapest AND
  * closest hotels"; for a training pipeline: documents on the
  * quality-vs-cost frontier when picking what to keep).
  *
  * The textbook formulation is a quadratic NOT EXISTS self-join; the 2-D
  * case instead admits the sweep-line identity this operator uses:
  * order points by `(x desc, y desc)` — a point is on the frontier iff
  * its `y` strictly exceeds the running max `y` of everything before it.
  * (Earlier points have `x' > x`, or `x' = x ∧ y' > y`; in both cases
  * "preceding max ≥ y" is exactly "dominated", given distinct points.)
  *
  * Scale shape: dedup to distinct points (one partial→final aggregate),
  * then the running max uses the same two-pass literal-quantile-bucket
  * trick as [[graft.pipeline.Packing.withGlobalCumsumBefore]]: bucket by
  * `x` against literals, per-bucket max `y` offsets via a
  * metadata-sized window over bucket ids (descending — a bucket's
  * offset is the max over HIGHER-x buckets), within-bucket descending
  * windows in parallel. Never a single-partition window over the data,
  * never an O(n²) join.
  *
  * To minimize a dimension, negate it on the way in. Exactly
  * reproducible — pure function of the distinct point set.
  */
object Skyline {

  /** Frontier of distinct `(xCol, yCol)` points, both maximized; output
    * columns are named after the inputs, ordered `x desc` (so `y` is
    * ascending along the frontier by construction). Null coordinates
    * are excluded — null is not comparable under domination. */
  def paretoFrontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .distinct()
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val probs = (1 until nParts).map(_.toDouble / nParts).toArray
    val bounds: Array[Double] =
      if (probs.isEmpty) Array.empty
      else pts.stat.approxQuantile("x", probs, 0.001 / nParts)
    // literal-comparison bucketing (Packing.scala:43-50 rationale):
    // equal x always lands in one bucket, so the within-bucket sweep
    // sees every same-x rival
    val bucketCol = bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col("x") > b, 1L).otherwise(0L)
    }
    val parts = pts.withColumn("_bkt", bucketCol)
    // offsets: max y over buckets with strictly larger x — one row per
    // bucket, so the global window is metadata-sized
    val offsets = parts.groupBy("_bkt").agg(max("y").as("_bmax"))
      .select(col("_bkt"),
        max("_bmax").over(Window.orderBy(col("_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)).as("_omax"))
    val within = Window.partitionBy("_bkt")
      .orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts.join(broadcast(offsets), "_bkt")
      // greatest() skips nulls: null only when no point precedes at all
      .withColumn("_pmax", greatest(max("y").over(within), col("_omax")))
      .filter(col("_pmax").isNull || col("y") > col("_pmax"))
      .select(col("x").as(xCol), col("y").as(yCol))
      .orderBy(col(xCol).desc)
  }
}

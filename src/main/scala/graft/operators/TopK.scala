package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state top-k per group as a partial→final aggregate.
  *
  * A custom [[Aggregator]] whose state is a bounded ordered buffer of
  * at most k (value, id) pairs — each input row is an O(log k)
  * insertion, partials merge pairwise, and the shuffle carries one
  * ≤k-element buffer per (partition, group) instead of the group's
  * rows.
  *
  * Honest scope note (measured, ScaleProbe `--family topk`): for the
  * PLAIN batch query, Spark 4's `InferWindowGroupLimit` already
  * rewrites `row_number() ... WHERE rn <= k` into a map-side group
  * limit, so the window route is bounded-state too (0.7 MB shuffle on
  * a 20M-row planted-hot-group probe) and its specialized
  * WindowGroupLimit exec beats this udaf's object-agg serialization
  * ~2× on wall clock. What the aggregate form buys instead:
  * (1) COMPOSABILITY — `groupBy(g).agg(sum(...), avg(...), topk(...))`
  * computes top-k alongside other aggregates in ONE aggregation pass,
  * where the window route needs a second shuffle plus a join back; and
  * (2) STREAMING — window functions are unsupported on streaming
  * Datasets, but this Aggregator runs inside a streaming groupBy
  * aggregation unchanged.
  *
  * Determinism contract: strictly ordered by (value DESC, id ASC) —
  * value ties break on the id, so the emitted rows and ranks are unique
  * and reproducible regardless of partitioning, which is what lets the
  * gate hash-match a `row_number` oracle with the same ORDER BY.
  */
object TopK {

  /** Insert `e` into `buf` (ordered by value desc, id asc), keeping at
    * most `k` elements. Vector state stays tiny (k ≤ ~100s); the
    * common miss case ("worse than current k-th") is O(1). */
  private def insert(k: Int, buf: Vector[(Double, Long)],
                     e: (Double, Long)): Vector[(Double, Long)] = {
    def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(cur => better(e, cur)) match {
        case -1 => buf.size
        case x  => x
      }
      val out = (buf.take(i) :+ e) ++ buf.drop(i)
      if (out.size > k) out.take(k) else out
    }
  }

  /** Top-k (value, id) pairs: zero = empty, reduce = bounded insert,
    * merge = fold the smaller partial into the larger. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Vector[(Double, Long)],
                         Vector[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: Vector[(Double, Long)] = Vector.empty
    def reduce(b: Vector[(Double, Long)], a: (Double, Long)): Vector[(Double, Long)] =
      insert(k, b, a)
    def merge(b1: Vector[(Double, Long)], b2: Vector[(Double, Long)]): Vector[(Double, Long)] = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      small.foldLeft(big)(insert(k, _, _))
    }
    def finish(r: Vector[(Double, Long)]): Vector[(Double, Long)] = r
    def bufferEncoder: Encoder[Vector[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Vector[(Double, Long)]] = ExpressionEncoder()
  }

  /** Top `k` rows per group by `valCol` desc (ties → smaller `idCol`),
    * emitted as (group, rank, id, value) — identical rows to the
    * `row_number` window formulation, produced with O(k) state per
    * group instead of a per-group sort. */
  def topKByGroup(df: DataFrame, groupCol: String, valCol: String,
                  idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    df.groupBy(groupCol)
      .agg(topk(col(valCol).cast("double"), col(idCol).cast("long")).as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as(idCol), col("col._1").as(valCol))
  }
}

package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact population covariance of an embedding column, as a d×d matrix.
  *
  * The relational route — explode each vector to (i, x_i), self-join per
  * row, groupBy (i,j) — shuffles rows·d² tuples (a 4096× fan-out at
  * d = 64): the classic scale-killer. This operator instead accumulates
  * the co-moment matrix PER PARTITION (count + mean vector + upper-
  * triangular Σx_i·x_j — constant O(d²) state regardless of partition
  * size), then merges the partition partials in ascending partition
  * order. One pass over the data, zero shuffle; the only movement is
  * partitions·O(d²) doubles to the driver — the same aggregation shape
  * Spark MLlib's `RowMatrix.computeGramianMatrix` uses, re-expressed
  * without the mllib dependency.
  *
  * Partial merge order is pinned (partition index ascending) so the
  * float sums are reproducible run-to-run on a fixed layout; the gate
  * pins every entry against the SQL oracle's `covar_pop` at 6 decimals
  * (cross-engine summation-order drift is ~1e-15 abs, five orders of
  * magnitude under the rounding granularity).
  */
object Covariance {

  /** One partition's accumulated moments. */
  private final class Moments(val d: Int) extends Serializable {
    var n: Long = 0L
    val s: Array[Double] = new Array[Double](d)        // Σ x_i
    val g: Array[Double] = new Array[Double](d * (d + 1) / 2) // Σ x_i·x_j, i≤j
    def add(v: Array[Double]): Unit = {
      require(v.length == d, s"ragged embedding: ${v.length} != $d")
      n += 1
      var i = 0
      var k = 0
      while (i < d) {
        s(i) += v(i)
        var j = i
        while (j < d) { g(k) += v(i) * v(j); j += 1; k += 1 }
        i += 1
      }
    }
    def merge(o: Moments): Moments = {
      n += o.n
      var i = 0
      while (i < s.length) { s(i) += o.s(i); i += 1 }
      var k = 0
      while (k < g.length) { g(k) += o.g(k); k += 1 }
      this
    }
  }

  /** All d(d+1)/2 upper-triangle entries as rows `(i, j, cov)` with
    * 1-based indices (matching SQL `generate_subscripts`) and
    * population covariance `Σxy/n − μ_i·μ_j`, rounded to `digits`. */
  def covarianceMatrix(emb: DataFrame, vecCol: String = "embedding",
                       digits: Int = 6): DataFrame = {
    val spark = emb.sparkSession
    val (_, _, c) = momentsOf(emb, vecCol)
    val scale = math.pow(10, digits)
    val rows = for { i <- c.indices; j <- i until c.length }
      yield Row((i + 1).toLong, (j + 1).toLong, math.rint(c(i)(j) * scale) / scale)
    // BIGINT indices, 1-based — the exact shape of SQL generate_subscripts
    val schema = StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("cov", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("i", "j")
  }

  /** The merged raw moments, for callers (PCA) that need the full
    * matrix + mean on the driver rather than a DataFrame. Returns
    * (n, mean vector, dense symmetric population covariance). */
  private[similarity] def momentsOf(emb: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val vecs = emb
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .rdd.map(_.getSeq[Double](0).toArray)
    val partials = vecs
      .mapPartitionsWithIndex { (idx, it) =>
        val first = if (it.hasNext) it.next() else null
        if (first == null) Iterator.empty
        else {
          val m = new Moments(first.length)
          m.add(first)
          it.foreach(m.add)
          Iterator((idx, m))
        }
      }
      .collect().sortBy(_._1).map(_._2)
    require(partials.nonEmpty, "momentsOf: empty input")
    val m = partials.reduceLeft(_.merge(_))
    val n = m.n.toDouble
    val mean = m.s.map(_ / n)
    val c = Array.ofDim[Double](m.d, m.d)
    var i = 0
    var k = 0
    while (i < m.d) {
      var j = i
      while (j < m.d) {
        val cov = m.g(k) / n - mean(i) * mean(j)
        c(i)(j) = cov; c(j)(i) = cov
        j += 1; k += 1
      }
      i += 1
    }
    (m.n, mean, c)
  }
}

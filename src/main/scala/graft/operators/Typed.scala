package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface over the canonical tables — the API tier
  * for pipeline code where compile-time row shapes beat dynamic schemas
  * (SURVEY §1.5: "typed `Dataset[YellowTrip]` etc. optional").
  *
  * Typed aggregators built as `TypedColumn`s still run as partial→final
  * HashAggregate — only closures (`map`/`mapGroups`) leave codegen, so
  * those are reserved for logic expressions cannot state (here: the
  * final few-row projection to the result case class).
  */
object Typed {

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: Timestamp,
                         o_orderpriority: String)

  final case class StatusProfile(o_orderstatus: String, n: Long,
                                 total: Double, median_price: Double)

  def orders(df: DataFrame): Dataset[Order] = {
    implicit val enc: Encoder[Order] = Encoders.product[Order]
    df.as[Order]
  }

  /** Exact median as a typed `Aggregator`: buffers each group's values
    * and merges partial buffers — the typed-API exactness option SURVEY
    * §7.3 allows. State is O(group size); at 100 TB group cardinality
    * use the `percentile_approx` sketch instead (this intentionally
    * does not replace it). */
  final class ExactMedianOf[I](f: I => Double) extends Aggregator[I, List[Double], Double] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: I): List[Double] = f(a) :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(r: List[Double]): Double = {
      val s = r.sorted
      if (s.isEmpty) Double.NaN
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-status order profile, fully typed: groupByKey + TypedColumn
    * aggregators (count/sum stay codegen'd; the median is the custom
    * Aggregator above). */
  def statusProfiles(ds: Dataset[Order]): Dataset[StatusProfile] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.o_orderstatus)
      .agg(
        count(lit(1)).as[Long],
        round(sum($"o_totalprice"), 0).as[Double],
        new ExactMedianOf[Order](_.o_totalprice).toColumn)
      .map { case (status, n, total, med) =>
        // HALF_UP to match Spark round() engine-wide (math.rint is
        // half-to-even and would diverge on an exact .5 tie)
        val med4 = if (med.isNaN) med
          else BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        StatusProfile(status, n, total, med4)
      }
  }
}

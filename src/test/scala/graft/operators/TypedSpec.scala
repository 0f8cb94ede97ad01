package graft.operators

import graft.SparkTestBase
import graft.sources.Tables

/** The typed surface must agree exactly with the untyped one — same
  * Catalyst engine underneath, so any divergence is a bug in the typed
  * plumbing (encoders, aggregator merge), not a semantics choice. */
class TypedSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("typed status profiles equal the untyped aggregation") {
    import org.apache.spark.sql.functions._
    val typed = Typed.statusProfiles(Typed.orders(Tables.orders(spark, sf)))
      .collect().map(p => (p.o_orderstatus, p.n, p.total, p.median_price)).toSet
    val untyped = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)), round(sum("o_totalprice"), 0),
        round(expr("percentile(o_totalprice, 0.5)"), 4))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(typed == untyped)
  }

  test("exact median aggregator: odd, even, and singleton groups") {
    import spark.implicits._
    val ds = Seq(("a", 1.0), ("a", 9.0), ("a", 5.0), // odd -> 5
      ("b", 2.0), ("b", 4.0),                        // even -> 3
      ("c", 7.0))                                    // singleton -> 7
      .toDF("k", "v").as[(String, Double)]
    val med = ds.groupByKey(_._1)
      .agg(new Typed.ExactMedianOf[(String, Double)](_._2).toColumn)
      .collect().toMap
    assert(med == Map("a" -> 5.0, "b" -> 3.0, "c" -> 7.0))
  }
}

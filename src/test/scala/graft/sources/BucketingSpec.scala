package graft.sources

import graft.SparkTestBase
import graft.sources.Tables

/** Bucketed tables must join without shuffling either side. */
class BucketingSpec extends SparkTestBase {

  test("co-located join of bucketed tables has no Exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 4)
    val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // and it is still a correct join
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf)
    assert(joined.count() == li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
  }
}

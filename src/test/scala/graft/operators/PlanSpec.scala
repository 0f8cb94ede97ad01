package graft.operators

import graft.SparkTestBase
import graft.sources.Tables

/** Plan-shape assertions: the scale properties we rely on (pushdown,
  * pruning, broadcast, top-k without full sort) must be visible in the
  * optimized physical plan, not assumed. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val plan = planOf(Relational.scanFilterProject(Tables.lineitem(spark, sf)))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("GreaterThan(l_quantity"))
  }

  test("projection prunes the parquet ReadSchema to selected columns") {
    val plan = planOf(Relational.scanFilterProject(Tables.lineitem(spark, sf)))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_shipdate"), "unused column must not be read")
  }

  test("dimension joins broadcast (no fact-side shuffle)") {
    val plan = planOf(Joins.customersByRegion(
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("semi-join stays a semi join with broadcast top-k side") {
    val plan = planOf(Joins.topCustomerOrders(Tables.orders(spark, sf)))
    assert(plan.contains("LeftSemi"))
  }

  test("orderBy+limit plans as TakeOrderedAndProject (no full sort)") {
    val plan = planOf(Relational.busiestKeys(Tables.orders(spark, sf)))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("aggregations are partial then final (map-side combine)") {
    val plan = planOf(Relational.pricingSummary(Tables.lineitem(spark, sf)))
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"))
  }

  test("hot paths stay inside whole-stage codegen") {
    // AQE hides codegen stages until execution; codegen explain shows them.
    val qe = Relational.pricingSummary(Tables.lineitem(spark, sf)).queryExecution
    val codegen = qe.explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"))
  }

  test("column profiler reads the table exactly once") {
    val plan = planOf(Profile.columnProfile(Tables.orders(spark, sf),
      Seq("o_custkey", "o_orderstatus")))
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected one scan, plan had $scans")
    // exact multi-column distinct goes through Expand (the documented
    // one-scan trade); the approx twin must NOT need it
    assert(plan.contains("Expand"))
    val approx = planOf(Profile.columnProfile(Tables.orders(spark, sf),
      Seq("o_custkey", "o_orderstatus"), exact = false))
    assert(!approx.contains("Expand"))
    assert(approx.linesIterator.count(_.contains("FileScan parquet")) == 1)
  }

  test("bloom pre-filter keeps the dim join broadcast") {
    import org.apache.spark.sql.functions.col
    val dim = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val plan = planOf(BloomJoin.bloomPrefilteredJoin(
      Tables.orders(spark, sf), dim, "o_custkey", "c_custkey", 4096))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}

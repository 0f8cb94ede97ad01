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
}

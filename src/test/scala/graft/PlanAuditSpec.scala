package graft

/** CI lock for the plan audit (previously only the manual
  * [[PlanAudit]] main): every `SparkEntry.queries` plan is built at
  * sf0.001 and must (a) analyze/plan without error and (b) contain zero
  * `CartesianProduct` nodes. BroadcastNestedLoopJoin is allowed — every
  * audited occurrence is a broadcast one-row scalar (COVID-baseline
  * ratios, census cross-joins); an unbroadcastable cartesian is the
  * scale-killer this spec exists to stop from shipping.
  *
  * Building a gate's DataFrame executes any driver-side fitting the
  * gate does (KMeans, BPE argmax collects) at sf0.001 — that cost is
  * the price of auditing the REAL plan each gate ships. */
class PlanAuditSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private val available = java.nio.file.Files.exists(java.nio.file.Paths.get(dir))

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"plan audit: $name") {
      assume(available, s"fixture dir $dir missing")
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"CartesianProduct in $name's physical plan:\n$plan")
    }
  }
}

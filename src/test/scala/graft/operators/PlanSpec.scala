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

  test("anti-join plans as LeftAnti, never a NOT IN cross shape") {
    val plan = planOf(Joins.customersWithoutOrders(
      Tables.customer(spark, sf), Tables.orders(spark, sf)))
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("null-safe join matches the null buckets to each other") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = Seq(Some(1L), None, None, Some(2L)).toDF("k0")
    val r = Seq(Some(1L), None, Some(3L)).toDF("k0")
    val rows = Joins.nullSafeKeyMatch(l, col("k0"), r, col("k0"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // null bucket: 2 left rows match 1 right row as ONE aggregated pair
    assert(rows == Set((-1L, 2L, 1L), (1L, 1L, 1L)))
  }

  test("scd2 asOf predicate pushes into a stored-history parquet scan") {
    // The point-in-time lookup a warehouse user types runs against a
    // PERSISTED history table — the probe must reach the parquet footer
    // (row-group skip), which requires the cast to sit on the literal,
    // never on the valid_from column.
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_plan")
    try {
      Scd2.build(Tables.orders(spark, sf).filter(col("o_custkey") < 100),
          "o_custkey", "o_orderdate", Seq("o_orderpriority"), "o_orderkey")
        .write.mode("overwrite").parquet(s"$dir/hist")
      val stored = spark.read.parquet(s"$dir/hist")
      val probe = java.sql.Timestamp.valueOf("1995-06-15 00:00:00")
      val plan = planOf(Scd2.asOf(stored, probe))
      assert(plan.contains("LessThanOrEqual(valid_from"),
        s"asOf filter not pushed:\n${plan.take(2000)}")
      assert(Scd2.asOf(stored, probe).count() > 0)
    } finally graft.Fs.deleteRecursively(dir)
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

  test("AQE actually splits a skewed sort-merge join at runtime (skew=true)") {
    // The session CONFIGURES adaptive skew-join handling; this proves it
    // ACTIVATES: a hot key holding most of one side must show up in the
    // final adaptive plan as SortMergeJoin(skew=true), with the result
    // still exactly the plain join's. Thresholds are lowered because the
    // defaults (256 MB skewed-partition floor) target real clusters, not
    // a test fixture; the MECHANISM exercised is the same.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      // hot key 0 carries ~97% of the fact side, padded to real bytes
      val fact = spark.range(150000).select(
        when(col("id") < 145000, 0L).otherwise(col("id") % 50).as("k"),
        concat(lit("x" * 120), col("id")).as("payload"))
      val dim = spark.range(50).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("tag"))
      // group on the DIM-side attribute: an agg keyed on the join key
      // could reuse the join's hash distribution, which lawfully blocks
      // the skew split (splitting would break the required distribution)
      // sum(length(payload)) keeps the fact payload un-prunable, so the
      // shuffled hot partition carries real bytes, not just the key
      val joined = fact.join(dim, "k")
        .groupBy("tag").agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plan = joined.queryExecution.executedPlan.toString // final AQE plan
      assert(plan.contains("skew=true"),
        s"adaptive plan did not mark the skewed join:\n${plan.take(2000)}")
      // result unchanged by the runtime split: 145000 hot rows + 100
      // modulo rows land on k=0; every other key gets exactly 100
      assert(rows("d0") == 145100L)
      assert(rows.size == 50 && rows.filterNot(_._1 == "d0").values.forall(_ == 100L))
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("drift operators keep their heavy side aggregate-shaped") {
    import org.apache.spark.sql.functions._
    // chi-square: marginal completion joins ride broadcasts, and the
    // only aggregations of DATA are partial->final (map-side combine)
    val chi = planOf(Drift.chiSquareIndependence(
      Tables.documents(spark, sf), "source", "lang"))
    assert(chi.contains("BroadcastExchange"), chi.take(1500))
    assert(!chi.contains("SortMergeJoin"), "marginals must broadcast")
    // KS: no data-sized single-partition window — every WindowExec with
    // an empty partition spec must sit above the per-bucket AGGREGATE
    // (metadata rows), which physically appears as the window reading
    // an exchange of a HashAggregate, never the raw value stream
    val ks = planOf(Drift.ksStatistic(Tables.events(spark, sf),
      "value", "event_type", "click", "view"))
    assert(ks.contains("HashAggregate"), ks.take(1500))
  }

  test("pmi and per-group sampling select via heaps, not global sorts") {
    import org.apache.spark.sql.functions._
    val pmi = planOf(graft.text.TextAnalysis.pmiPhrases(
      Tables.documents(spark, sf), k = 20, minCount = 5L))
    assert(pmi.contains("TakeOrderedAndProject"), pmi.take(1500))
    val r4 = planOf(graft.pipeline.TrainingData.weightedSamplePerGroup(
      Tables.documents(spark, sf).withColumn("w", lit(1.0)),
      5, col("w"), "source"))
    // selection is a window per stratum — rank filter present, and no
    // global (partition-less) sort of the corpus
    assert(r4.contains("RunningWindowFunction") || r4.contains("Window"),
      r4.take(1500))
  }

  test("skyline dedups before sweeping and never forms a loop join") {
    val plan = planOf(Skyline.paretoFrontier2D(
      Tables.lineitem(spark, sf), "l_extendedprice", "l_discount"))
    assert(plan.contains("HashAggregate"), "distinct must aggregate")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      "the quadratic formulation must not appear")
  }

  test("star revenue broadcasts the snowflake dims and pushes the year filter") {
    val plan = planOf(Joins.revenueByNation(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf),
      Tables.region(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // the year predicate must sit on the orders scan side, below the
    // fact-fact join (shows up as a Filter over the orders relation)
    assert(plan.contains("year("), plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("distribution balance is two hash aggregations, no window or join") {
    val plan = planOf(Relational.distributionBalance(
      Tables.documents(spark, sf), "source", "lang"))
    assert(plan.contains("HashAggregate"), plan.take(1500))
    assert(!plan.contains("Window") && !plan.contains("Join"), plan.take(1500))
  }

  test("q3-shape top-k plans as a bounded heap with pushed filters") {
    import org.apache.spark.sql.functions._
    val plan = planOf(Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") > lit("1997-06-30").cast("timestamp_ntz"))
      .join(Tables.orders(spark, sf).filter(year(col("o_orderdate")) <= 1997),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(sum("l_extendedprice").as("revenue"))
      .orderBy(desc("revenue")).limit(10))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(plan.contains("GreaterThan(l_shipdate"),
      "shipdate filter must reach the lineitem scan\n" + plan.take(2000))
  }

  test("naive bayes model and vocab joins ride broadcasts") {
    val plan = planOf(graft.ml.NaiveBayes.confusionMatrix(
      Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // the vocab restriction is a broadcast LEFT SEMI, not a shuffle
    assert(plan.contains("LeftSemi"), plan.take(1500))
  }

  test("weighted quantiles share one exchange for both windows") {
    val plan = planOf(Relational.weightedQuantiles(
      Tables.lineitem(spark, sf), "l_returnflag", "l_extendedprice",
      "l_quantity"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("incremental view update joins the base only by changeset keys") {
    import org.apache.spark.sql.functions._
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val ch = base.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), lit("delete").as("op"),
        col("o_orderstatus"), col("o_totalprice"))
    val view = SnapshotDiff.aggView(base, "o_orderstatus", "o_totalprice")
    val plan = planOf(SnapshotDiff.incrementalAggUpdate(view, base, ch,
      "o_orderkey", "o_orderstatus", "o_totalprice"))
    // the retraction join is a LeftSemi (keys only), so the base's
    // payload never shuffles into the changeset side
    assert(plan.contains("LeftSemi"), plan.take(1500))
  }
}

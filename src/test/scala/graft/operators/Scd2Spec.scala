package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // key 1: A -> A (collapse) -> B -> B (collapse) -> C
    (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 11L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 12L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 13L, "B"),
    (1L, ts("2024-01-05 00:00:00"), 14L, "C"),
    // key 2: single observation stays current
    (2L, ts("2024-02-01 00:00:00"), 20L, "X"))
    .toDF("k", "obs_ts", "seq", "attr")

  test("collapses unchanged runs and chains validity intervals") {
    val h = Scd2.build(log, "k", "obs_ts", Seq("attr"), "seq")
      .orderBy("k", "version").collect()
    val rows = h.map(r => (r.getLong(0), r.getString(1), r.getInt(2),
      r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      (1L, "A", 1, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", 2, ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      (1L, "C", 3, ts("2024-01-05 00:00:00"), None, true),
      (2L, "X", 1, ts("2024-02-01 00:00:00"), None, true)))
  }

  test("same-timestamp observations are ordered by the tiebreak") {
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"))
      .toDF("k", "obs_ts", "seq", "attr")
    val h = Scd2.build(tied, "k", "obs_ts", Seq("attr"), "seq")
      .orderBy("version").collect()
    assert(h.map(_.getString(1)).toSeq == Seq("A", "B"))
    assert(h.map(_.getBoolean(5)).toSeq == Seq(false, true))
  }

  test("null-safe attribute compare: null -> value opens a version") {
    val withNull = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, None: Option[String]),
      (1L, ts("2024-01-02 00:00:00"), 2L, None: Option[String]), // collapse
      (1L, ts("2024-01-03 00:00:00"), 3L, Some("A")))
      .toDF("k", "obs_ts", "seq", "attr")
    val h = Scd2.build(withNull, "k", "obs_ts", Seq("attr"), "seq").collect()
    assert(h.length == 2)
  }

  test("asOf returns the version in effect at the probe instant") {
    val h = Scd2.build(log, "k", "obs_ts", Seq("attr"), "seq")
    val at = Scd2.asOf(h, ts("2024-01-03 12:00:00"))
      .select("k", "attr").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 1 is mid-version-B; key 2 not yet born
    assert(at == Map(1L -> "B"))
    val later = Scd2.asOf(h, ts("2024-03-01 00:00:00"))
      .select("k", "attr").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(later == Map(1L -> "C", 2L -> "X"))
  }

  test("joinAsOf matches each fact to the version in effect at its timestamp") {
    val h = Scd2.build(log, "k", "obs_ts", Seq("attr"), "seq")
    val facts = Seq(
      (1L, ts("2024-01-02 12:00:00"), "f1"), // mid version A
      (1L, ts("2024-01-03 00:00:00"), "f2"), // exactly at B's valid_from -> B
      (1L, ts("2024-06-01 00:00:00"), "f3"), // open current version C
      (2L, ts("2024-01-15 00:00:00"), "f4"), // before key 2's first version -> dropped
      (3L, ts("2024-01-01 00:00:00"), "f5")) // unknown key -> dropped
      .toDF("k", "fact_ts", "tag")
    val got = Scd2.joinAsOf(facts, h, "k", "fact_ts")
      .select("tag", "attr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("f1" -> "A", "f2" -> "B", "f3" -> "C"))
    // one-to-at-most-one: row count never exceeds the fact count
    assert(Scd2.joinAsOf(facts, h, "k", "fact_ts").count() == 3)
  }

  test("mergeLate equals the full rebuild, touched keys only recomputed") {
    // hold out one mid-history observation for key 1; key 2 untouched
    val late = log.filter($"seq" === 12L)
    val base = log.filter($"seq" =!= 12L)
    val hist = Scd2.build(base, "k", "obs_ts", Seq("attr"), "seq")
    val merged = Scd2.mergeLate(hist, base, late, "k", "obs_ts",
      Seq("attr"), "seq")
    val full = Scd2.build(log, "k", "obs_ts", Seq("attr"), "seq")
    assert(merged.count() == full.count())
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // untouched key 2 must appear exactly as in the pre-merge history
    assert(merged.filter($"k" === 2L).collect().toSeq ==
      hist.filter($"k" === 2L).collect().toSeq)
  }

  test("mergeLate with a NULL-key late row still equals the full rebuild") {
    // build() groups NULL keys as a real partition, so mergeLate must
    // treat NULL like any touched key: select its old observations into
    // the rebuild AND evict its old history rows (null-safe joins)
    val nlog = Seq(
      (Option(1L), ts("2024-01-01 00:00:00"), 1L, "A"),
      (None: Option[Long], ts("2024-01-01 00:00:00"), 2L, "N1"),
      (None: Option[Long], ts("2024-01-03 00:00:00"), 4L, "N2"))
      .toDF("k", "obs_ts", "seq", "attr")
    val nlate = Seq(
      (None: Option[Long], ts("2024-01-02 00:00:00"), 3L, "NX"))
      .toDF("k", "obs_ts", "seq", "attr")
    val hist = Scd2.build(nlog, "k", "obs_ts", Seq("attr"), "seq")
    val merged = Scd2.mergeLate(hist, nlog, nlate, "k", "obs_ts",
      Seq("attr"), "seq")
    val full = Scd2.build(nlog.unionByName(nlate), "k", "obs_ts",
      Seq("attr"), "seq")
    assert(merged.count() == full.count(),
      s"merged=${merged.count()} full=${full.count()}")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // the null key's history: N1 -> NX -> N2, three versions
    assert(merged.filter($"k".isNull).count() == 3)
  }

  test("one shuffle: a single Exchange below both window passes") {
    val plan = Scd2.build(log, "k", "obs_ts", Seq("attr"), "seq")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcCompactSpec extends SparkTestBase {
  import spark.implicits._

  private def log(rows: (String, Long, String, Option[Double], Option[Double])*) =
    rows.toSeq.toDF("k", "seq", "op", "before", "after")

  test("the four endpoint cases net correctly") {
    val rows = CdcCompact.compact(log(
        // existed, still exists → update first-before → last-after
        ("a", 1L, "update", Some(1.0), Some(2.0)),
        ("a", 2L, "update", Some(2.0), Some(3.0)),
        // existed, deleted → delete
        ("b", 1L, "update", Some(5.0), Some(6.0)),
        ("b", 2L, "delete", Some(6.0), None),
        // new, survives → insert with last value
        ("c", 1L, "insert", None, Some(7.0)),
        ("c", 2L, "update", Some(7.0), Some(8.0)),
        // new, deleted again → nothing
        ("d", 1L, "insert", None, Some(9.0)),
        ("d", 2L, "delete", Some(9.0), None)), "k", "seq")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[String]("op"), Option(r.getAs[java.lang.Double]("before")),
          Option(r.getAs[java.lang.Double]("after")))).toMap
    assert(rows("a") == (("update", Some(1.0), Some(3.0))))
    assert(rows("b") == (("delete", Some(5.0), None)))
    assert(rows("c") == (("insert", None, Some(8.0))))
    assert(!rows.contains("d"))
  }

  test("an update chain that round-trips to the original value is a no-op") {
    val out = CdcCompact.compact(log(
      ("a", 1L, "update", Some(1.0), Some(9.0)),
      ("a", 2L, "update", Some(9.0), Some(1.0))), "k", "seq")
    assert(out.count() == 0)
  }

  test("applying the compacted log to a maintained view equals the full log") {
    val base = (1 to 300).map(i => (s"k${i % 9}", i.toLong, (i % 31) * 2.0))
      .toDF("g", "id", "v")
    val view = IncrementalAgg.viewOf(base, "g", "v")
    // per-id op chains keyed to the GROUP for the view: update ids %3,
    // delete ids %5 (after their updates), insert fresh ids %4
    val ups = base.filter(col("id") % 3 === 0)
      .select(col("g").as("k"), col("id").as("seq"), lit("update").as("op"),
        col("v").as("before"), (col("v") + 1).as("after"))
    // compaction key must identify the ROW (id), not the group; net
    // per-id ops are then re-keyed to the group for applyCdc
    val idLog = base.filter(col("id") % 3 === 0)
      .select(col("id").as("k"), lit(1L).as("seq"), lit("update").as("op"),
        col("v").as("before"), (col("v") + 1).as("after"))
      .unionByName(base.filter(col("id") % 3 === 0 && col("id") % 5 === 0)
        .select(col("id").as("k"), lit(2L).as("seq"), lit("delete").as("op"),
          (col("v") + 1).as("before"), lit(null).cast("double").as("after")))
      .unionByName(base.filter(col("id") % 4 === 0)
        .select((col("id") + 1000).as("k"), lit(1L).as("seq"),
          lit("insert").as("op"), lit(null).cast("double").as("before"),
          (col("v") * 3).as("after")))
    val groupOf = base.select(col("id").as("k"), col("g"))
      .unionByName(base.filter(col("id") % 4 === 0)
        .select((col("id") + 1000).as("k"), col("g")))
      .distinct()
    def applied(cdcById: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.applyCdc(view,
          cdcById.join(groupOf, "k").select(col("g"), col("op"),
            col("before"), col("after")), "g")
        .select(col("g"), col("n"), round(col("total"), 6).as("t"))
        .orderBy("g").collect().toSeq
    val full = applied(idLog)
    val compacted = applied(CdcCompact.compact(idLog, "k", "seq"))
    assert(full == compacted)
    assert(ups.count() > 0) // fixture sanity
  }

  test("invariant to partitioning") {
    val rows = (1 to 600).map { i =>
      val op = i % 3 match {
        case 0 => "insert"; case 1 => "update"; case _ => "delete" }
      (s"k${i % 37}", i.toLong, op,
        if (op == "insert") None else Some(i * 1.0),
        if (op == "delete") None else Some(i * 2.0))
    }
    val a = CdcCompact.compact(rows.toDF("k", "seq", "op", "before", "after"),
      "k", "seq").orderBy("k").collect().toSeq
    val b = CdcCompact.compact(
      scala.util.Random.shuffle(rows).toDF("k", "seq", "op", "before", "after")
        .repartition(13), "k", "seq").orderBy("k").collect().toSeq
    assert(a == b)
  }
}

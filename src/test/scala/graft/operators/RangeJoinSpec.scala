package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed range join equals the naive interval predicate") {
    val points = (0 until 200).map { i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))
    }.toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:30:00")),
      (101L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:10:00")), // overlaps 100
      (102L, ts("2024-01-01 22:00:00"), ts("2024-01-01 23:59:00")))
      .toDF("iid", "start_ts", "end_ts")
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "ts", "start_ts", "end_ts")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
      $"ts" >= $"start_ts" && $"ts" <= $"end_ts")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
    // a point inside two overlapping intervals matches both, once each
    val multi = bucketed.groupBy(_._1).map(_._2.size)
    assert(multi.exists(_ > 1))
  }

  test("intervalOverlap equals the naive overlap predicate, each pair once") {
    // left: 50 intervals of varying width; right: 40 shifted intervals
    val left = (0 until 50).map(i =>
      (i.toLong, i * 37L % 1000, i * 37L % 1000 + 5 + i % 90)).toDF("lid", "ls", "le")
    val right = (0 until 40).map(j =>
      (j.toLong, j * 53L % 1000, j * 53L % 1000 + 3 + j % 120)).toDF("rid", "rs", "re")
    for (width <- Seq(16L, 64L, 1024L)) {
      val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", width)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = left.join(right, $"ls" <= $"re" && $"rs" <= $"le")
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      // same pair SET and same MULTIPLICITY (exactly-once emission,
      // even when a pair shares many buckets at small widths)
      assert(got.sorted.toSeq == naive.sorted.toSeq, s"width $width")
      assert(naive.nonEmpty && got.length == got.toSet.size)
    }
  }

  test("pointInInterval accepts TIMESTAMP_NTZ columns (fixture parquet type)") {
    // The driver fixtures are pandas-written timestamp[us] => Spark reads
    // TIMESTAMP_NTZ, which unix_millis/unix_timestamp REJECT un-cast
    // (the round-7 j9 failure). Pin the operator's house-rule cast path
    // against a frame whose columns really are NTZ-typed.
    import org.apache.spark.sql.functions.to_timestamp_ntz
    import org.apache.spark.sql.types.TimestampNTZType
    val points = (0 until 100).map { i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00")
    }.toDF("pid", "raw").select($"pid", to_timestamp_ntz($"raw").as("ts"))
    val intervals = Seq(
      (100L, "2024-01-01 02:00:00", "2024-01-01 03:30:00"),
      (101L, "2024-01-01 22:00:00", "2024-01-01 23:59:00"))
      .toDF("iid", "s_raw", "e_raw")
      .select($"iid", to_timestamp_ntz($"s_raw").as("start_ts"),
        to_timestamp_ntz($"e_raw").as("end_ts"))
    assert(points.schema("ts").dataType == TimestampNTZType)
    assert(intervals.schema("start_ts").dataType == TimestampNTZType)
    val got = RangeJoin
      .pointInInterval(points, intervals, "ts", "start_ts", "end_ts")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
      $"ts" >= $"start_ts" && $"ts" <= $"end_ts")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("intervalOverlap maxBucketsPerRow fails fast on pathological fan-out") {
    val left = Seq((1L, 0L, 1000000L)).toDF("lid", "ls", "le") // 1M-wide
    val right = Seq((2L, 10L, 20L)).toDF("rid", "rs", "re")
    val e = intercept[Exception] { // SparkRuntimeException from assert_true
      RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re",
        bucketWidth = 10L, maxBucketsPerRow = 1024).collect()
    }
    assert(e.getMessage.contains("intervalOverlap"))
    // same data clears the guard once the grid is widened
    val ok = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re",
      bucketWidth = 100000L).select("lid", "rid").collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("intervalOverlap contracts: shared names and bad width fail fast") {
    val a = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    val b = Seq((1L, 0L, 1L)).toDF("id2", "s2", "e2")
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(a, a, "s", "e", "s", "e", 10L))
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(a, b, "s", "e", "s2", "e2", 0L))
  }
}

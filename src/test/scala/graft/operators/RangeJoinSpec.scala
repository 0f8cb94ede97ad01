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

  test("intervalOverlap contracts: shared names and bad width fail fast") {
    val a = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    val b = Seq((1L, 0L, 1L)).toDF("id2", "s2", "e2")
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(a, a, "s", "e", "s", "e", 10L))
    intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(a, b, "s", "e", "s2", "e2", 0L))
  }
}

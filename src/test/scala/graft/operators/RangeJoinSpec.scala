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
}

package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches the most recent prior right row per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "A", 0.0),
      (2L, ts("2024-01-01 10:00:20"), "A", 0.0),
      (3L, ts("2024-01-01 10:00:01"), "B", 0.0))
      .toDF("event_id", "ts", "key", "x")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), "A", 100.0),
      (11L, ts("2024-01-01 10:00:10"), "A", 105.0),
      (12L, ts("2024-01-01 10:00:30"), "A", 110.0), // after both trades
      (13L, ts("2024-01-01 10:00:02"), "B", 50.0))  // after B's trade
      .toDF("event_id", "ts", "key", "quote")
    val out = AsOfJoin.asOf(trades, quotes, "key", "ts", "event_id", Seq("quote"))
      .select("event_id", "asof_quote").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(100.0)) // latest quote at/before 10:00:05
    assert(out(2L).contains(105.0)) // 10:00:10 quote, not the later 110
    assert(out(3L).isEmpty)         // no prior quote for B
  }

  test("forward as-of attaches the earliest right row at-or-after per key") {
    val alarms = Seq(
      (1L, ts("2024-01-01 10:00:05"), "A", 0.0),
      (2L, ts("2024-01-01 10:00:20"), "A", 0.0),
      (3L, ts("2024-01-01 10:00:40"), "A", 0.0))
      .toDF("event_id", "ts", "key", "x")
    val beats = Seq(
      (10L, ts("2024-01-01 10:00:05"), "A", 1.0), // exactly at alarm 1 -> visible
      (11L, ts("2024-01-01 10:00:30"), "A", 2.0))
      .toDF("event_id", "ts", "key", "hb")
    val out = AsOfJoin.asOfForward(alarms, beats, "key", "ts", "event_id", Seq("hb"))
      .select("event_id", "asofnext_hb").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(1.0)) // >= semantics at equal ts
    assert(out(2L).contains(2.0)) // next beat after 10:00:20
    assert(out(3L).isEmpty)       // no beat after 10:00:40
  }

  test("right row at exactly left.ts is included (<= semantics)") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "K", 0.0)).toDF("event_id", "ts", "key", "x")
    val r = Seq((9L, ts("2024-01-01 12:00:00"), "K", 7.0)).toDF("event_id", "ts", "key", "p")
    val out = AsOfJoin.asOf(l, r, "key", "ts", "event_id", Seq("p")).collect().head
    assert(out.getAs[Double]("asof_p") == 7.0)
  }
}

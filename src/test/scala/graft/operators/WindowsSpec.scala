package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("retentionCohorts: offsets count distinct return visits per cohort") {
    // u1 first seen day 1, returns day 2 (twice — must count once) and day 9
    // (beyond maxOffset 7 → dropped); u2 first seen day 2, returns day 3;
    // u3 first seen day 2, never returns
    val events = Seq(
      (1L, ts(1)), (1L, ts(2, 3)), (1L, ts(2, 9)), (1L, ts(9)),
      (2L, ts(2)), (2L, ts(3)),
      (3L, ts(2)))
      .toDF("user_id", "ts")
    val out = Windows.retentionCohorts(events, maxOffsetDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 1) -> 1L,
      ("2024-01-02", 0) -> 2L, ("2024-01-02", 1) -> 1L))
  }

  test("transitionMatrix counts consecutive pairs per user, ts-ordered") {
    // u1: a→b→a (2 transitions); u2: b→b; single-event u3 contributes none
    val events = Seq(
      (1L, ts(1, 1), 10L, "a"), (1L, ts(1, 2), 11L, "b"), (1L, ts(1, 3), 12L, "a"),
      (2L, ts(1, 1), 20L, "b"), (2L, ts(1, 2), 21L, "b"),
      (3L, ts(1, 1), 30L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Windows.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("resampleDailyFfill: gap days appear, carry forward, and are flagged") {
    // group "a": days 1 and 4 observed → days 2,3 are gaps carrying day 1
    val events = Seq(
      ("a", ts(1), 10.0), ("a", ts(1, 6), 20.0), ("a", ts(4), 40.0),
      ("b", ts(2), 7.0))
      .toDF("event_type", "ts", "value")
    val rows = Windows.resampleDailyFfill(events, "event_type")
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      ("a", "2024-01-01", Some(15.0), 15.0, false),
      ("a", "2024-01-02", None, 15.0, true),
      ("a", "2024-01-03", None, 15.0, true),
      ("a", "2024-01-04", Some(40.0), 40.0, false),
      ("b", "2024-01-02", Some(7.0), 7.0, false)))
  }

  test("ewma matches the sequential textbook recursion") {
    // adjusted form: s_t = Σ β^(t-k) v_k / Σ β^(t-k); cross-check the
    // window-fold implementation against a driver-side recursion
    val vals = Seq(10.0, 20.0, 5.0, 40.0, 40.0, 1.0, 13.5)
    val events = vals.zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }
      .toDF("user_id", "event_id", "value")
    val got = Windows.ewma(events, alpha = 0.5)
      .orderBy("event_id").collect().map(_.getDouble(3)).toSeq
    val beta = 0.5
    val expected = vals.indices.map { t =>
      val ws = (0 to t).map(k => math.pow(beta, t - k))
      val s = (0 to t).map(k => ws(k) * vals(k)).sum / ws.sum
      math.rint(s * 1e4) / 1e4
    }
    assert(got == expected)
  }

  test("ewma horizon is insensitive past the double-epsilon point") {
    // both horizons exceed the sequence length, so both fold the full
    // prefix — results must be identical; the sf gates then pin the
    // 64-row truncation against the untruncated oracle on real data
    val events = (0 until 30)
      .map(i => (1L, i.toLong, math.sin(i * 1.7) * 100 + 100))
      .toDF("user_id", "event_id", "value")
    val a = Windows.ewma(events, alpha = 0.5, horizon = 60)
      .orderBy("event_id").collect().map(_.getDouble(3)).toSeq
    val b = Windows.ewma(events, alpha = 0.5, horizon = 200)
      .orderBy("event_id").collect().map(_.getDouble(3)).toSeq
    assert(a == b)
  }

  test("rollingDistinctUsers counts each user once per window") {
    def d(day: Int) = Timestamp.valueOf(f"2024-03-${day + 1}%02d 08:00:00")
    // day 0: {u1, u2}; day 3: {u1} (already seen inside the window);
    // day 9: {u3, u4} + u1's day-3 visit still in range
    val ev = Seq((1L, d(0)), (2L, d(0)), (1L, d(3)), (1L, d(3)),
      (3L, d(9)), (4L, d(9))).toDF("user_id", "ts")
    val r = Windows.rollingDistinctUsers(ev, "user_id", "ts", windowDays = 7)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("2024-03-01", 2L), ("2024-03-04", 2L),
      ("2024-03-10", 3L)))
  }

  test("rollingDistinctUsers skips absent calendar days and stays deterministic") {
    def d(day: Int) = Timestamp.valueOf(f"2024-03-${day + 1}%02d 08:00:00")
    val ev = (1 to 200).map(k => ((k % 23).toLong, d(k % 28)))
      .toDF("user_id", "ts")
    val base = Windows.rollingDistinctUsers(ev, "user_id", "ts")
    // every output day must be a day that actually occurs in the input
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd"))
      .distinct().as[String].collect().toSet
    assert(base.select("day").as[String].collect().forall(days.contains))
    val a = base.collect().toSeq
    val b = Windows.rollingDistinctUsers(ev.repartition(17), "user_id", "ts")
      .collect().toSeq
    assert(a == b)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.expr
import java.sql.Timestamp

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("strict ordering: steps must advance in time per user") {
    // u1 completes A→B→C in order; u2 has B before A (B must re-occur
    // after A to count — it doesn't); u3 stops at B
    val ev = Seq(
      (1L, ts(0), "A"), (1L, ts(10), "B"), (1L, ts(20), "C"),
      (2L, ts(0), "B"), (2L, ts(5), "A"), (2L, ts(3), "C"),
      (3L, ts(0), "A"), (3L, ts(1), "B")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.ordered(ev, "user_id", "ts", "event_type",
      Seq("A", "B", "C")).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("maxGap prunes conversions outside the window; pct is of step 1") {
    // u1 clicks 10 min after view (inside 15m gap), u2 clicks 30 min
    // after (outside); both viewed
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "click"),
      (2L, ts(0), "view"), (2L, ts(30), "click")
    ).toDF("user_id", "ts", "event_type")
    val rows = Funnel.ordered(ev, "user_id", "ts", "event_type",
      Seq("view", "click"), Some(expr("INTERVAL 15 MINUTES"))).collect()
    val byStep = rows.map(r => r.getInt(0) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(byStep(1) == ((2L, 1.0)))
    assert(byStep(2) == ((1L, 0.5)))
    intercept[IllegalArgumentException](
      Funnel.ordered(ev, "user_id", "ts", "event_type", Seq.empty))
  }

  test("first-occurrence chaining is greedy: earliest step-1 time rules") {
    // u1's first view is at t=0; the click at t=5 chains from it even
    // though a later view at t=4 is closer
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(4), "view"), (1L, ts(5), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.ordered(ev, "user_id", "ts", "event_type",
      Seq("view", "click"), Some(expr("INTERVAL 3 MINUTES"))).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // gap measured from t=0, so the t=5 click is OUTSIDE the 3-minute
    // window — greedy chaining, not backtracking
    assert(out == Map(1 -> 1L, 2 -> 0L))
  }

  test("stepLatency measures first-A to first-B-after-A") {
    val ev = Seq(
      // u1: signup@0, clicks at 10 and 20 → latency 10 min
      (1L, ts(0), "signup"), (1L, ts(10), "click"), (1L, ts(20), "click"),
      // u2: click@5 BEFORE signup@30 doesn't count; click@60 does → 30
      (2L, ts(5), "click"), (2L, ts(30), "signup"), (2L, ts(60), "click"),
      // u3: signup only → entered but not converted
      (3L, ts(0), "signup")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.stepLatency(ev, "user_id", "ts", "event_type",
      Seq("signup", "click")).collect().head
    assert(r.getString(0) == "signup->click")
    assert(r.getLong(1) == 3L)    // entered
    assert(r.getLong(2) == 2L)    // converted
    assert(r.getDouble(3) == 20.0) // median of {10, 30}
    assert(r.getDouble(4) == 28.0) // p90 interpolated between 10 and 30
  }

  test("stepLatency is deterministic across partitionings") {
    val ev = (1 to 300).map { k =>
      val typ = Seq("signup", "click", "purchase")(k % 3)
      ((k % 13).toLong, ts(k % 97), typ)
    }.toDF("user_id", "ts", "event_type")
    val steps = Seq("signup", "click", "purchase")
    val a = Funnel.stepLatency(ev, "user_id", "ts", "event_type", steps)
      .collect().toSeq
    val b = Funnel.stepLatency(ev.repartition(17), "user_id", "ts",
      "event_type", steps).collect().toSeq
    assert(a == b)
  }
}

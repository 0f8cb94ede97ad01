package graft.operators

import graft.SparkTestBase

import java.sql.Timestamp

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def t(h: Int) = new Timestamp(1700000000000L + h * 3600000L)

  private val events = Seq(
    // u1: one click before the purchase → full credit to click
    (1L, 10L, t(1), "click", 0.0), (2L, 10L, t(2), "purchase", 10.0),
    // u2: view + click inside the window → 4 each
    (3L, 20L, t(0), "view", 0.0), (4L, 20L, t(1), "click", 0.0),
    (5L, 20L, t(50), "purchase", 8.0),
    // u3: purchase first, click only AFTER → direct
    (6L, 30L, t(0), "purchase", 5.0), (7L, 30L, t(1), "click", 0.0),
    // u4: click outside the 3-day window → direct
    (8L, 40L, t(0), "click", 0.0), (9L, 40L, t(96), "purchase", 7.0)
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("credits split evenly; untouched conversions go direct") {
    val r = Attribution.linear(events, "event_id", "user_id", "ts",
      "event_type", "value", convType = "purchase", windowDays = 3)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq(("click", 2L, 14.0), ("direct", 2L, 12.0),
      ("view", 1L, 4.0)))
  }

  test("value conservation: attributed total equals conversion total") {
    val total = Attribution.linear(events, "event_id", "user_id", "ts",
      "event_type", "value", "purchase", 3)
      .agg(org.apache.spark.sql.functions.sum("attributed_value"))
      .head().getDouble(0)
    assert(total == 30.0)
  }

  test("deterministic across partitionings") {
    val big = (1 to 400).map { k =>
      val typ = if (k % 5 == 0) "purchase" else Seq("click", "view")(k % 2)
      (k.toLong, (k % 11).toLong, t(k % 90), typ, (k % 7).toDouble)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val a = Attribution.linear(big, "event_id", "user_id", "ts",
      "event_type", "value", "purchase", 3).collect().toSeq
    val b = Attribution.linear(big.repartition(19), "event_id", "user_id",
      "ts", "event_type", "value", "purchase", 3).collect().toSeq
    assert(a == b)
  }
}

package graft.operators

import graft.SparkTestBase

class MarketBasketSpec extends SparkTestBase {
  import spark.implicits._

  test("pairRules computes textbook support/confidence/lift") {
    // baskets: {a,b}, {a,b,c}, {a}, {b} → n=4
    // (a,b): both=2, a in 3, b in 3 → support .5, conf 2/3, lift 4·2/9
    // (a,c): both=1 → support .25, conf 1/3, lift 4/3
    // (b,c): both=1 → support .25, conf 1/3, lift 4/3
    val df = Seq(
      (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "c"), (2, "c"), // dup item must not double-count
      (3, "a"), (4, "b"))
      .toDF("basket", "item")
    val rows = MarketBasket.pairRules(df, "basket", "item").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(rows(("a", "b")) == ((2L, 0.5, 0.666667, math.rint(8.0 / 9 * 1e4) / 1e4)))
    assert(rows(("a", "c")) == ((1L, 0.25, 0.333333, 1.3333)))
    assert(rows(("b", "c")) == ((1L, 0.25, 0.333333, 1.3333)))
  }
}

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

  test("itemItemTopK ranks neighbors by cosine with id tie-break") {
    // a co-occurs with b twice (n_a=3, n_b=3) and with c once (n_c=2):
    // cos(a,b) = 2/3, cos(a,c) = 1/√6 — b must outrank c for a
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (4, "b"), (5, "c"))
      .toDF("basket", "item")
    val r = MarketBasket.itemItemTopK(df, "basket", "item", k = 2)
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getString(2))
      .toMap
    assert(r(("a", 1)) == "b" && r(("a", 2)) == "c")
    assert(r(("b", 1)) == "a" && r(("b", 2)) == "c")
    // c ties a and b on cosine (1 common basket each, same marginals):
    // the id tie-break must pick "a" first
    assert(r(("c", 1)) == "a" && r(("c", 2)) == "b")
  }

  test("itemItemTopK is deterministic across partitionings") {
    val df = (1 to 600).map(k => (k % 80, s"i${k % 13}"))
      .toDF("basket", "item")
    val a = MarketBasket.itemItemTopK(df, "basket", "item").collect().toSeq
    val b = MarketBasket.itemItemTopK(df.repartition(19), "basket", "item")
      .collect().toSeq
    assert(a == b)
  }
}

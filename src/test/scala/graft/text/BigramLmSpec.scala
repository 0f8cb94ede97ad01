package graft.text

import graft.SparkTestBase

class BigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("Kneser-Ney: hand-checked probabilities on a tiny corpus") {
    // "a b a b a c": bigrams ab(2) ba(2) ac(1); 3 types; D = 0.75
    //   P(b|a) = (2-.75)/3 + (.75·2/3)·(1/3) = 0.583333…
    //   P(a|b) = (2-.75)/2 + (.75·1/2)·(1/3) = 0.75
    //   P(c|a) = (1-.75)/3 + (.75·2/3)·(1/3) = 0.25
    // avg lp = (2·ln(7/12) + 2·ln(3/4) + ln(1/4)) / 5 = -0.607930…
    val docs = Seq((1L, "en", "a b a b a c")).toDF("doc_id", "lang", "text")
    val r = BigramLm.scoreByLangKN(docs).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "en" && r.head.getLong(1) == 1L)
    val expect = (2 * math.log(7.0 / 12) + 2 * math.log(0.75)
      + math.log(0.25)) / 5
    assert(math.abs(r.head.getDouble(2) - math.rint(expect * 1e4) / 1e4) < 1e-12)
    intercept[IllegalArgumentException](
      BigramLm.scoreByLangKN(docs, discount = 1.5))
  }

  test("KN separates in-distribution prose from unseen-vocabulary junk") {
    val corpus = (1L to 20L).map(i => (i, "en", "the cat sat on the mat")) ++
      (21L to 23L).map(i => (i, "xx", s"zz$i qq$i ww$i rr$i"))
    val got = BigramLm.scoreByLangKN(corpus.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("en") > got("xx"))
  }
}

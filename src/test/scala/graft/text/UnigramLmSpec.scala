package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: "a" ×6, "b" ×2, "z" ×1 → total 9 tokens
  private lazy val docs = Seq(
    (1L, "en", "a a a b"), (2L, "en", "a a a b"), (3L, "en", "z"))
    .toDF("doc_id", "lang", "text")

  test("model keeps the top-K by count with deterministic ties") {
    val m = UnigramLm.unigramModel(docs, vocabSize = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(m.toSeq == Seq("a" -> 6L, "b" -> 2L)) // z truncated
  }

  test("scores are exact count-ratio logs with an OOV floor") {
    val s = UnigramLm.scoreDocuments(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val lpA = math.log(6.0 / 9); val lpB = math.log(2.0 / 9)
    assert(s(1L)._1 == 4L)
    assert(math.abs(s(1L)._2 - (3 * lpA + lpB) / 4) < 1e-12)
    // doc 3's only token fell out of the vocab → pure floor score
    assert(math.abs(s(3L)._2 - math.log(0.5 / 9)) < 1e-12)
    // junk scores strictly below prose
    assert(s(3L)._2 < s(1L)._2)
  }

  test("ccnetBuckets tertiles a language into head/middle/tail by score") {
    // nine docs with strictly ordered scores: three pure-"a" (best),
    // three mixed, three pure-OOV junk (worst)
    val corpus = (1L to 3L).map(i => (i, "en", "a a a a")) ++
      (4L to 6L).map(i => (i, "en", "a b")) ++
      (7L to 9L).map(i => (i, "en", "qq ww"))
    val buckets = UnigramLm.ccnetBuckets(
        corpus.toDF("doc_id", "lang", "text"), vocabSize = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(buckets == Map("head" -> 3L, "middle" -> 3L, "tail" -> 3L))
  }

  test("ccnetBuckets approx tier matches exact on small data") {
    val corpus = (1L to 30L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr", s"a ${"b " * (i % 5).toInt}tok$i"))
      .toDF("doc_id", "lang", "text")
    val exact = UnigramLm.ccnetBuckets(corpus, 10, exact = true)
      .collect().map(_.toSeq)
    val approx = UnigramLm.ccnetBuckets(corpus, 10, exact = false)
      .collect().map(_.toSeq)
    assert(exact.toSeq == approx.toSeq)
  }

  test("empty corpus yields an empty result, not a driver error") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(UnigramLm.scoreDocuments(empty, 10).isEmpty)
  }

  test("zero-token documents drop out instead of scoring NaN") {
    val withEmpty = docs.union(Seq((4L, "en", "   ")).toDF("doc_id", "lang", "text"))
    val ids = UnigramLm.scoreDocuments(withEmpty, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }
}

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

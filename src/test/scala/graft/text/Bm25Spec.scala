package graft.text

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles the hash join build side"),
    (2L, "hash hash hash everywhere a hash"),
    (3L, "broadcast join beats shuffle join for small dims"),
    (4L, "nothing relevant here at all"),
    (5L, "spark spark spark spark spark spark spark spark"))
    .toDF("doc_id", "text")

  /** Naive in-test reference: same tokenizer, same Lucene idf. */
  private def naive(q: Seq[String], k1: Double = 1.2, b: Double = 0.75) = {
    val docs = corpus.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    docs.flatMap { case (id, toks) =>
      val score = q.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = docs.values.count(_.contains(t)).toDouble
        if (tf == 0) 0.0
        else math.log(1 + (n - df + 0.5) / (df + 0.5)) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * toks.size / avgdl))
      }.sum
      if (score > 0) Some(id -> BigDecimal(score).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
  }

  test("matches a naive reference implementation, ranked desc with id tiebreak") {
    val got = Bm25.topK(corpus, Seq("hash", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val want = naive(Seq("hash", "join")).toSeq
      .sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == want)
    // doc 4 (no query term) and doc 5 (only 'spark') never surface
    assert(!got.map(_._1).contains(4L) && !got.map(_._1).contains(5L))
  }

  test("tf saturation: repeating a term grows the score sublinearly") {
    val scores = Bm25.topK(corpus, Seq("hash"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2 has tf=4 vs doc 1 tf=1, but scores less than 4x doc 1's
    assert(scores(2L) > scores(1L))
    assert(scores(2L) < 4 * scores(1L))
  }

  test("top-k plans a TakeOrderedAndProject, not a global sort") {
    val plan = Bm25.topK(corpus, Seq("hash", "join"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("construction contracts fail fast") {
    intercept[IllegalArgumentException](Bm25.topK(corpus, Seq.empty))
    intercept[IllegalArgumentException](Bm25.topK(corpus, Seq("a", "a")))
    intercept[IllegalArgumentException](Bm25.topK(corpus, Seq("a"), b = 1.5))
  }
}

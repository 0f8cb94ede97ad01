package graft.pipeline

import graft.SparkTestBase

class TrainingDataSpec extends SparkTestBase {
  import spark.implicits._

  // a natural English sentence long enough to clear the length score
  private val good = ("the cat sat on the mat and it is a good day " * 5).trim

  private val docs = Seq(
    (0L, good),                    // kept
    (1L, good),                    // exact dup of 0 -> dropped
    (2L, "!!! ??? ***"),           // pure punctuation -> quality 0
    (3L, ("der hund und die katze ist da " * 8).trim)) // German, kept
    .toDF("doc_id", "text")

  test("pipeline dedups, drops low quality, labels language") {
    val out = TrainingData.prepare(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 3L))
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(0L) == "en")
    assert(byId(3L) == "de")
  }

  test("summary aggregates per guessed language") {
    val s = TrainingData.summary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s.keySet == Set("en", "de"))
    assert(s("en")._1 == 1L)
    // token budget = whitespace tokens of the one kept English doc
    assert(s("en")._2 == good.split(" ").count(_.nonEmpty))
  }

  test("quality threshold is honored") {
    // with an impossible threshold nothing survives
    assert(TrainingData.prepare(docs, minQuality = 1.1).isEmpty)
  }
}

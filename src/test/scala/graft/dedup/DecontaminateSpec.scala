package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val w = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b").toIndexedSeq
  private def sent(idx: Int*): String = idx.map(w).mkString(" ")

  test("drops docs sharing a k-shingle with eval, keeps disjoint docs") {
    // eval doc = tokens a..l; train doc 1 embeds 8 consecutive tokens of
    // it (c..j) inside other text; doc 2 shares only 7 consecutive (< k);
    // doc 3 is disjoint
    val eval = Seq((100L, "en", sent(0 to 11: _*))).toDF("doc_id", "lang", "text")
    val train = Seq(
      (1L, "en", "x y " + sent(2 to 9: _*) + " z"),
      (2L, "en", "x y " + sent(2 to 8: _*) + " z"),
      (3L, "en", sent(13 to 25: _*)))
      .toDF("doc_id", "lang", "text")
    val kept = Decontaminate.decontaminate(train, eval, k = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    val rep = Decontaminate.report(train, eval, k = 8).collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq(("en", 3L, 2L, 1L)))
  }

  test("bloom variant never misses an exactly-contaminated doc") {
    val eval = Seq(
      (100L, "en", sent(0 to 11: _*)),
      (101L, "en", sent(30 to 45: _*)))
      .toDF("doc_id", "lang", "text")
    val train = (1 to 40).map { i =>
      // every 4th doc embeds an 8-token run of an eval doc
      val t = if (i % 4 == 0) "x y " + sent(2 to 9: _*) + s" z$i"
              else sent(i % 20 + 50 to i % 20 + 60: _*) + s" u$i"
      (i.toLong, "en", t)
    }.toDF("doc_id", "lang", "text")
    val exact = Decontaminate.contaminatedIds(train, eval, k = 8)
      .as[Long].collect().toSet
    val bloom = Decontaminate.contaminatedIdsBloom(train, eval, k = 8)
      .as[Long].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(bloom), s"bloom missed ${exact -- bloom}")
    // at fpp=1e-6 over ~hundreds of probes, over-removal should be nil
    assert((bloom -- exact).size <= 1)
  }

  test("short documents are caught via their whole-text shingle") {
    val eval = Seq((100L, "en", "alpha beta gamma")).toDF("doc_id", "lang", "text")
    val train = Seq(
      (1L, "en", "alpha beta gamma"),        // exact short dup
      (2L, "en", "alpha beta delta"))        // differs
      .toDF("doc_id", "lang", "text")
    val kept = Decontaminate.decontaminate(train, eval, k = 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("contaminationMatrix attributes leaks per (source, eval set)") {
    // benchA = tokens 0..11, benchB = tokens 30..41; source sA leaks
    // benchA via two docs, source sB leaks benchB via one doc, and sB
    // also has a clean doc that must not appear anywhere
    val eval = Seq(
      (100L, "benchA", sent(0 to 11: _*)),
      (200L, "benchB", sent(30 to 41: _*))).toDF("doc_id", "eval_set", "text")
    val train = Seq(
      (1L, "sA", "x y " + sent(2 to 9: _*)),
      (2L, "sA", sent(0 to 7: _*) + " q r"),
      (3L, "sB", "p " + sent(32 to 39: _*)),
      (4L, "sB", sent(60 to 70: _*)))
      .toDF("doc_id", "source", "text")
    val out = Decontaminate.contaminationMatrix(train, eval, k = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 leaks shingle (2..9), doc 2 leaks (0..7): 2 docs, 2 shingles
    assert(out == Map(
      ("sA", "benchA") -> ((2L, 2L)),
      ("sB", "benchB") -> ((1L, 1L))))
  }
}

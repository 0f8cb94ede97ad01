package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount drops empty tokens from repeated separators") {
    val n = Seq("a b  c", "", " ", "one").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(n == Seq(3, 0, 0, 1))
  }

  test("stopword ratio and punct ratio") {
    val r = Seq("the cat and the hat!").toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text")).as("s"),
        TextAnalysis.punctRatio(col("text")).as("p"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 3.0 / 5.0) < 1e-9) // the, and, the
    assert(math.abs(r.getDouble(1) - 1.0 / 20.0) < 1e-9) // '!' of 20 chars
  }

  test("fingerprint matches a reference FNV-1a/32 implementation") {
    def fnv(s: String): Long = {
      var h = 2166136261L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = ((h ^ cp.toLong) * 16777619L) & 0xFFFFFFFFL
        i += Character.charCount(cp)
      }
      h
    }
    // includes a non-BMP char: native must fold CODE POINTS like the
    // declarative split+ascii form, not UTF-16 units
    val texts = Seq("hello world", "hello worle", "", "a", "hi 😀 end")
    val got = texts.toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == texts.map(fnv))
    // native expression == the declarative aggregate form it replaced
    val decl = texts.toDF("text")
      .select(TextAnalysis.fingerprintDeclarative(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(decl == got)
  }

  test("langid picks the language with most marker hits") {
    val out = Seq(
      ("d1", "the cat is of the hat"),   // en markers
      ("d2", "der hund und die katze"),  // de markers
      ("d3", "xyzzy qwerty"))            // none -> und
      .toDF("doc_id", "text")
    val got = TextAnalysis.withLangGuess(out)
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("d1") == "en")
    assert(got("d2") == "de")
    assert(got("d3") == "und")
  }

  test("approx vocabulary count tracks exact within rsd tolerance") {
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}").mkString(" "),
        if (i % 2 == 0) "en" else "de", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val exact = TextAnalysis.vocabByLang(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = TextAnalysis.vocabByLangApprox(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, v) =>
      assert(math.abs(approx(lang) - v).toDouble / v < 0.05,
        s"$lang: approx ${approx(lang)} vs exact $v")
    }
  }

  test("quality score is bounded in [0,1]") {
    val q = Seq("the quick brown fox and a dog in the yard is it",
      "!!!???", "x").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }
}

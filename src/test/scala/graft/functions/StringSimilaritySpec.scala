package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** Jaro-Winkler: pins the textbook values (which are also DuckDB's
  * `jaro_winkler_similarity` outputs — the d18 oracle depends on the
  * two implementations agreeing bit-for-bit after rounding), the
  * boost-threshold edge, and interp ≡ codegen. */
class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinklerSim(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match the published constants") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(jw("abcdef", "abcdef") == 1.0)
    assert(jw("a", "") == 0.0 && jw("", "") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: adjacent transposes miss
  }

  test("prefix boost applies only above the 0.7 threshold") {
    // jaro = 0.6 with a 4-char common prefix: NO boost (0.6 <= 0.7)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // jaro > 0.7 with prefix: boosted above raw jaro
    val raw = StringSimilarity.jaroSim("aluminium", "alumnium")
    assert(jw("aluminium", "alumnium") > raw)
  }

  test("interp equals codegen through a DataFrame") {
    val pairs = Seq(("martha", "marhta"), ("crate", "trace"),
      ("jellyfish", "smellyfish"), ("x", "y"))
    val viaDf = pairs.toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    val interp = pairs.map { case (a, b) =>
      StringSimilarity.JaroWinkler(Literal(a), Literal(b)).eval(null)
        .asInstanceOf[Double]
    }
    assert(viaDf == interp)
    // null propagates
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}

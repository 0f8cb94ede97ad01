package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("small groups and their row mass are counted; l-diversity floor") {
    // QI (city, age): one group of 12 (2 sensitive values), one of 3
    // (1 value), one singleton
    val df = ((1 to 12).map(i => ("nyc", 30, i % 2)) ++
      (1 to 3).map(_ => ("sfo", 40, 1)) :+ (("chi", 50, 0)))
      .toDF("city", "age", "s")
    val r = Privacy.kAnonymityCensus(df, Seq("city", "age"), col("s"), k = 10)
      .collect()(0)
    assert(r.getLong(0) == 3L, "n_groups")
    assert(r.getLong(1) == 2L, "groups under k=10")
    assert(r.getLong(2) == 4L, "rows at risk = 3 + 1")
    assert(r.getLong(3) == 1L, "min group size")
    assert(r.getLong(4) == 1L, "l-diversity floor: sfo/chi are constant")
  }

  test("laplaceNoisedCounts: deterministic seeded noise, non-negative release") {
    val df = ((1 to 40).map(_ => "en") ++ (1 to 7).map(_ => "de") ++
      Seq("fr")).toDF("lang")
    def run() = Privacy.laplaceNoisedCounts(df, "lang",
      (ascii(substring(col("lang"), 1, 1)) * 256
        + ascii(substring(col("lang"), 2, 1))).cast("long"), eps = 0.5)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getLong(3))).toMap
    val a = run()
    assert(a == run(), "seeded mechanism must be reproducible")
    assert(a("en")._1 == 40L && a("de")._1 == 7L && a("fr")._1 == 1L)
    a.values.foreach { case (t, noised, released) =>
      assert(noised != t.toDouble, "noise must actually perturb")
      // Laplace(b=2): |noise| < b·ln(2^31) ≈ 43 by construction of the
      // bounded uniform; sanity-check a loose envelope
      assert(math.abs(noised - t) < 45.0, s"noise out of envelope: $noised vs $t")
      assert(released >= 0L, "post-processed release must be non-negative")
    }
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisedCounts(df, "lang", lit(1L), eps = 0.0)
    }
  }
}

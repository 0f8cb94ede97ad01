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
}

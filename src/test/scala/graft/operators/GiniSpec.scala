package graft.operators

import graft.SparkTestBase

class GiniSpec extends SparkTestBase {
  import spark.implicits._

  test("perfect equality is 0; extreme concentration approaches 1") {
    val equal = (1 to 100).map(i => ("eq", i.toLong, 5.0))
    // one key holds everything, 99 hold (nearly) nothing
    val conc = (1 to 99).map(i => ("cc", i.toLong, 1e-9)) :+ (("cc", 100L, 1e6))
    val rows = Relational.giniByGroup((equal ++ conc).toDF("g", "k", "v"),
        "g", "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("eq") == 0.0, s"equal shares must be gini 0: ${rows("eq")}")
    assert(rows("cc") > 0.98, s"one-key concentration: ${rows("cc")}")
  }

  test("known hand value: shares (1,2,3,4) give gini 0.25") {
    // G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 60/40 - 1.25 = 0.25
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0)).toDF("g", "k", "v")
    val g = Relational.giniByGroup(df, "g", "k", "v").collect()(0).getDouble(2)
    assert(g == 0.25)
  }
}

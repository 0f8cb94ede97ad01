package graft.operators

import graft.SparkTestBase

class HigherMomentsSpec extends SparkTestBase {
  import spark.implicits._

  test("symmetric data has zero skew; uniform-ish kurtosis is negative") {
    // symmetric around 3: {1,2,3,4,5} per group
    val df = (0 until 500).map(i => ("g", (i % 5 + 1).toDouble)).toDF("g", "x")
    val r = Relational.higherMoments(df, "g", "x").collect()(0)
    assert(r.getLong(1) == 500L)
    assert(r.getDouble(2) == 3.0) // mean
    assert(r.getDouble(3) == 2.0) // m2 of {1..5} uniform
    assert(r.getDouble(4) == 0.0) // perfectly symmetric
    // discrete uniform on 5 points: m4 = 6.8, kurt = 6.8/4 - 3 = -1.3
    assert(r.getDouble(5) == -1.3)
  }

  test("right-skewed data has positive skewness") {
    val df = ((1 to 90).map(_ => ("g", 1.0)) ++ (1 to 10).map(_ => ("g", 10.0)))
      .toDF("g", "x")
    val r = Relational.higherMoments(df, "g", "x").collect()(0)
    assert(r.getDouble(4) > 1.0, s"expected strong right skew, got ${r.getDouble(4)}")
  }
}

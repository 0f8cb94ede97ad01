package graft.operators

import graft.SparkTestBase

class MaxConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("counts the classic sweep: nested, chained, and disjoint") {
    // [0,10) ∪ [2,5) ∪ [3,4) peak 3 at t=3; [10,12) chains (half-open:
    // the interval ending at 10 does not overlap the one starting at 10)
    val df = Seq(("a", 0L, 10L), ("a", 2L, 5L), ("a", 3L, 4L),
      ("a", 10L, 12L), ("b", 0L, 1L), ("b", 5L, 6L))
      .toDF("k", "s", "e")
    val m = Intervals.maxConcurrency(df, "k", "s", "e").collect()
      .map(r => r.getAs[String]("k") -> (r.getAs[Long]("n_intervals"),
        r.getAs[Long]("peak"), r.getAs[Long]("peak_at"))).toMap
    assert(m("a") == ((4L, 3L, 3L)))
    assert(m("b") == ((2L, 1L, 0L)))
  }

  test("identical intervals stack, and ties at one instant resolve ends first") {
    // three copies of [1,2) → peak 3; a [2,3) starter after they all
    // end must NOT see them (peak stays 3, not 4)
    val df = Seq(("k", 1L, 2L), ("k", 1L, 2L), ("k", 1L, 2L),
      ("k", 2L, 3L)).toDF("k", "s", "e")
    val r = Intervals.maxConcurrency(df, "k", "s", "e").collect().head
    assert(r.getAs[Long]("peak") == 3)
    assert(r.getAs[Long]("peak_at") == 1)
  }

  test("invariant to partitioning") {
    val rows = (1 to 400).map(i =>
      (s"k${i % 3}", (i * 13 % 97).toLong, (i * 13 % 97 + i % 11 + 1).toLong))
    val a = Intervals.maxConcurrency(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect().toSeq
    val b = Intervals.maxConcurrency(
      scala.util.Random.shuffle(rows).toDF("k", "s", "e").repartition(9),
      "k", "s", "e").collect().toSeq
    assert(a == b)
  }
}

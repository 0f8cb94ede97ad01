package graft.operators

import graft.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  test("overlapping and touching intervals merge; gaps split islands") {
    val df = Seq(
      // key a: [0,10] [5,20] (overlap) [20,25] (touch) | [40,45]
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 40L, 45L),
      // key b: swallowed interval — [0,100] contains [10,20] and [30,40]
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 30L, 40L),
      // key c: single point-ish interval
      ("c", 7L, 7L)
    ).toDF("k", "s", "e")
    val got = Intervals.unionCoverage(df, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 2L, 30L, 25L),   // [0,25] (25) + [40,45] (5)
      ("b", 1L, 100L, 100L), // the long interval swallows both
      ("c", 1L, 0L, 0L)))
  }

  test("coverage is invariant to input row order and partitioning") {
    val rows = (1 to 300).map { i =>
      val s = (i * 97 % 1000).toLong
      ("k" + (i % 5), s, s + (i * 13 % 50).toLong)
    }
    def run(seq: Seq[(String, Long, Long)], parts: Int) =
      Intervals.unionCoverage(seq.toDF("k", "s", "e").repartition(parts),
        "k", "s", "e").collect().map(_.toSeq).toSeq
    assert(run(rows, 1) == run(scala.util.Random.shuffle(rows), 16))
  }
}

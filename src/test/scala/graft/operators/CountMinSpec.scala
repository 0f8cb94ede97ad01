package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // 60 rows: key k repeated k times (k = 1..10, 55 rows) + 5 singletons
  private val rows = ((1 to 10).flatMap(k => Seq.fill(k)(k.toLong)) ++
    (100L to 104L)).toDF("k")

  private def exact = rows.groupBy("k").count().collect()
    .map(r => r.getLong(0).toString -> r.getLong(1)).toMap

  test("estimates never underestimate and are exact without collisions") {
    val sketch = CountMin.build(rows, col("k"), depth = 4, width = 1024)
    val est = CountMin.estimate(sketch, rows, col("k"), depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact
    assert(est.keySet == ex.keySet)
    ex.foreach { case (k, c) => assert(est(k) >= c, s"under at $k") }
    // 15 keys in 1024 buckets x 4 rows: no key collides in every row
    assert(est == ex)
  }

  test("forced collisions overestimate, bounded by the min across depths") {
    val sketch = CountMin.build(rows, col("k"), depth = 4, width = 4)
    val est = CountMin.estimate(sketch, rows, col("k"), depth = 4, width = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact
    ex.foreach { case (k, c) =>
      assert(est(k) >= c && est(k) <= 60L, s"$k: est ${est(k)} exact $c")
    }
    // with 15 keys in 4 buckets SOME key must overestimate
    assert(ex.exists { case (k, c) => est(k) > c })
  }

  test("sketches are additive: merge(half, half) estimates == whole-build") {
    val (a, b) = (rows.filter($"k" % 2 === 0), rows.filter($"k" % 2 =!= 0))
    val merged = CountMin.merge(
      CountMin.build(a, col("k"), 4, 64), CountMin.build(b, col("k"), 4, 64))
    val whole = CountMin.build(rows, col("k"), 4, 64)
    val em = CountMin.estimate(merged, rows, col("k"), 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ew = CountMin.estimate(whole, rows, col("k"), 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(em == ew)
  }

  test("unseen probe keys estimate >= 0; null keys are skipped; contracts") {
    val sketch = CountMin.build(rows, col("k"), 4, 1024)
    val unseen = Seq(999L).toDF("k")
    val est = CountMin.estimate(sketch, unseen, col("k"), 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("999") >= 0L)
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("k")
    // null key contributes no counters: total mass = 2 per depth row
    val s2 = CountMin.build(withNull, col("k"), 2, 16)
    assert(s2.groupBy("d").agg(sum("cnt")).collect()
      .forall(_.getLong(1) == 2L))
    intercept[IllegalArgumentException](CountMin.build(rows, col("k"), 0, 16))
    intercept[IllegalArgumentException](
      CountMin.estimate(sketch, rows, col("k"), 4, 0))
  }
}

package graft.pipeline

import graft.SparkTestBase

class QuantileNormSpec extends SparkTestBase {
  import spark.implicits._

  test("two sources with shifted distributions align after normalization") {
    // source A: 1..5, source B: 101..105 — same shape, shifted; after
    // normalization the k-th smallest of each maps to the same global
    // percentile BAND, and the source medians map near the global median
    val df = ((1 to 5).map(i => (i.toLong, "A", i.toDouble)) ++
      (1 to 5).map(i => (100L + i, "B", 100.0 + i)))
      .toDF("doc_id", "source", "score")
    val out = QuantileNorm.normalize(df, "source", "score", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    // within-source percentiles are equal for matching positions
    (1 to 5).foreach { i =>
      assert(out(i.toLong)._1 == out(100L + i)._1)
      // and so are the normalized scores
      assert(out(i.toLong)._2 == out(100L + i)._2)
    }
    // extremes map to global extremes: p=0 → global min (1), p=1 → max (105)
    assert(out(1L)._2 == 1.0 && out(101L)._2 == 1.0)
    assert(out(5L)._2 == 105.0 && out(105L)._2 == 105.0)
  }

  test("identity when there is a single source") {
    // rank i of n maps to global rank floor((i-1)/(n-1)*(n-1))+1 = i
    val df = (1 to 9).map(i => (i.toLong, "X", i * 2.0)).toDF("doc_id", "source", "score")
    val out = QuantileNorm.normalize(df, "source", "score", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    (1 to 9).foreach(i => assert(out(i.toLong) == i * 2.0))
  }

  test("null scores are excluded; ties break by id deterministically") {
    val df = Seq(
      (1L, "A", Some(5.0)), (2L, "A", Some(5.0)), (3L, "A", None),
      (4L, "B", Some(7.0))
    ).toDF("doc_id", "source", "score")
    val out = QuantileNorm.normalize(df, "source", "score", "doc_id")
    assert(out.count() == 3)
    val ranks = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ranks(1L) == 0.0 && ranks(2L) == 1.0) // tie split by doc_id
  }

  test("result is invariant to input partitioning") {
    val df = (1 to 40).map(i =>
      (i.toLong, if (i % 3 == 0) "A" else "B", (i * 37 % 11).toDouble))
      .toDF("doc_id", "source", "score")
    val a = QuantileNorm.normalize(df.repartition(1), "source", "score", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = QuantileNorm.normalize(df.repartition(13), "source", "score", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}

package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // target corpus speaks one register; the raw pool mixes target-like
  // docs (ids 100-119) with off-distribution docs (ids 120-139)
  private val corpus = {
    val target = (1 to 20).map(i =>
      (i.toLong, "the model trains on clean prose with clear structure", true))
    val rawLike = (100 to 119).map(i =>
      (i.toLong, "clean prose with clear structure trains the model", false))
    val rawJunk = (120 to 139).map(i =>
      (i.toLong, "zzz qqq xxx kkk vvv jjj www yyy uuu ooo", false))
    (target ++ rawLike ++ rawJunk).toDF("doc_id", "text", "is_target")
  }

  test("importance weights rank target-like raw docs above off-distribution ones") {
    val w = Dsir.importanceWeights(corpus, col("is_target"), buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // only raw-pool docs are scored
    assert(w.keySet.forall(_ >= 100L) && w.size == 40)
    val like = (100 to 119).map(i => w(i.toLong))
    val junk = (120 to 139).map(i => w(i.toLong))
    assert(like.min > junk.max,
      s"target-like min ${like.min} vs junk max ${junk.max}")
  }

  test("selectTopK resamples toward the target distribution, deterministically") {
    val s1 = Dsir.selectTopK(corpus, col("is_target"), k = 15, buckets = 1024)
      .select("doc_id").as[Long].collect()
    assert(s1.length == 15)
    // importance resampling must overwhelmingly pick target-like docs
    assert(s1.count(_ < 120L) >= 12, s"picked ${s1.mkString(",")}")
    val s2 = Dsir.selectTopK(corpus.repartition(7), col("is_target"),
      k = 15, buckets = 1024).select("doc_id").as[Long].collect()
    assert(s2.toSeq == s1.toSeq) // pure function of (corpus, buckets, seed)
    val s3 = Dsir.selectTopK(corpus, col("is_target"), k = 15,
      buckets = 1024, seed = 7L).select("doc_id").as[Long].collect()
    assert(s3.toSeq != s1.toSeq) // a new seed redraws
  }

  test("selection plans a TakeOrderedAndProject; contracts fail fast") {
    val plan = Dsir.selectTopK(corpus, col("is_target"), k = 5,
      buckets = 1024).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    intercept[IllegalArgumentException](
      Dsir.selectTopK(corpus, col("is_target"), k = 0))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, col("is_target"), buckets = 0))
  }
}

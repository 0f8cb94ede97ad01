package graft.operators

import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("joinCardinalityEstimate tracks the true join size") {
    // left: keys 1..100, 5 rows each; right: keys 51..150, 2 rows each
    // overlap = 50 keys -> true join = 50 * 5 * 2 = 500
    val left = (1 to 100).flatMap(k => Seq.fill(5)(k.toLong)).toDF("lk")
    val right = (51 to 150).flatMap(k => Seq.fill(2)(k.toLong)).toDF("rk")
    val r = Joins.joinCardinalityEstimate(left, "lk", right, "rk").head()
    assert(r.getAs[Long]("n_left") == 500L)
    assert(r.getAs[Long]("n_right") == 200L)
    val est = r.getAs[Long]("est_join_rows")
    assert(math.abs(est - 500L) <= 75, s"estimate $est vs true 500")
    // estimate equals the exact join count formula under the uniform
    // model: overlap * (500/100) * (200/100) with sketch-sized slack
    val ov = r.getAs[Long]("d_overlap")
    assert(math.abs(ov - 50L) <= 8, s"overlap $ov vs true 50")
  }

  test("bloom pre-filtered join equals the plain join exactly") {
    val fact = (1L to 2000L).map(k => (k, k % 100, s"f$k"))
      .toDF("row_id", "fk", "payload")
    val dim = Seq((3L, "a"), (7L, "b"), (42L, "c"))
      .toDF("dk", "dim_name")
    val out = BloomJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk", 1024)
      .select("row_id", "dim_name")
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("row_id", "dim_name")
    val a = out.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = plain.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.size == 60) // 3 matching keys × 20 fact rows each
  }

  test("string join keys work (keys are hashed, never cast to long)") {
    val fact = (1 to 500).map(k => (k.toLong, s"user_$k")).toDF("row_id", "fk")
    val dim = Seq(("user_7", "a"), ("user_42", "b")).toDF("dk", "dim_name")
    val out = BloomJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk", 1024)
      .select("row_id", "dim_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((7L, "a"), (42L, "b")))
  }

  test("eager variant: same result, broadcast destroyed, output reusable") {
    val fact = (1L to 2000L).map(k => (k, k % 100, s"f$k"))
      .toDF("row_id", "fk", "payload")
    val dim = Seq((3L, "a"), (7L, "b"), (42L, "c"))
      .toDF("dk", "dim_name")
    val (out, bfB) = BloomJoin.eagerWithHandle(fact, dim, "fk", "dk", 1024, 0.01)
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("row_id", "dim_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = out.select("row_id", "dim_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == plain)
    // the broadcast really is destroyed post-call — reading it now throws
    intercept[org.apache.spark.SparkException] { bfB.value }
    // and the checkpointed result survives the destroy: a SECOND action
    // (the collect above was the first) still works because the output
    // no longer references the filter
    assert(out.count() == 60)
  }

  test("the pre-filter actually removes non-matching fact rows") {
    val fact = (1L to 1000L).map(k => (k, k)).toDF("row_id", "fk")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    // count rows surviving JUST the bloom filter (before the join):
    // with fpp=0.01 on 3 keys the filter must pass ≪ all 1000
    val bf = dim.stat.bloomFilter("dk", 4096, 0.01)
    val passed = fact.filter(r => bf.mightContainLong(r.getLong(1))).count()
    assert(passed < 50, s"bloom passed $passed of 1000")
    val joined = BloomJoin.bloomPrefilteredJoin(fact, dim, "fk", "dk", 4096)
    assert(joined.count() == 3)
  }
}

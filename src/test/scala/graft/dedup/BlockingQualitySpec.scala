package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BlockingQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("hand-checked census: 6 records, 2 entities, 2 blocks") {
    // entity e1 = {1,2,3} (blocks A,A,B), e2 = {4,5} (B,B), singleton 6 (A)
    val recs = Seq((1L, "A", "e1"), (2L, "A", "e1"), (3L, "B", "e1"),
      (4L, "B", "e2"), (5L, "B", "e2"), (6L, "A", "s"))
      .toDF("id", "blk", "ent")
    val r = Linkage.blockingQuality(recs, "blk", "ent").collect().head
    assert(r.getAs[Long]("n_records") == 6)
    assert(r.getAs[Long]("n_all_pairs") == 15)
    // blocks A=3, B=3 → 3 + 3 candidates
    assert(r.getAs[Long]("n_candidates") == 6)
    // true pairs: C(3,2) + C(2,2·) = 3 + 1
    assert(r.getAs[Long]("n_true_pairs") == 4)
    // captured: e1 in A has 2 records → 1 pair; e2 in B has 2 → 1 pair
    assert(r.getAs[Long]("n_captured") == 2)
    assert(r.getAs[Double]("reduction_ratio") == 0.6)
    assert(r.getAs[Double]("pairs_completeness") == 0.5)
  }

  test("blocking by the entity itself captures everything") {
    val recs = (1 to 100).map(i => (i.toLong, s"e${i % 20}"))
      .toDF("id", "ent").withColumn("blk", col("ent"))
    val r = Linkage.blockingQuality(recs, "blk", "ent").collect().head
    assert(r.getAs[Double]("pairs_completeness") == 1.0)
    assert(r.getAs[Long]("n_candidates") == r.getAs[Long]("n_true_pairs"))
  }

  test("invariant to partitioning") {
    val recs = (1 to 500).map(i => (i.toLong, i % 13, s"e${i % 77}"))
    val a = Linkage.blockingQuality(recs.toDF("id", "blk", "ent"),
      "blk", "ent").collect().toSeq
    val b = Linkage.blockingQuality(
      scala.util.Random.shuffle(recs).toDF("id", "blk", "ent")
        .repartition(11), "blk", "ent").collect().toSeq
    assert(a == b)
  }
}

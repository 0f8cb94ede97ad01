package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("weights match the hand-computed Fellegi–Sunter model") {
    // one block, 4 records, field values A A B B → 6 pairs, 2 agree
    // → u = 1/3; m = 0.9
    val recs = Seq((1L, 1, "A"), (2L, 1, "A"), (3L, 1, "B"), (4L, 1, "B"))
      .toDF("id", "blk", "f")
    val rows = Linkage.matchWeights(recs, "id", "blk", Seq(
        Linkage.CompareField("f", col("l_f") === col("r_f"), 0.9)))
      .collect()
    val byFlag = rows.map(r =>
      r.getAs[Int]("g_f") -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("weight"))).toMap
    val u = 2.0 / 6.0
    assert(byFlag(1)._1 == 2)
    assert(byFlag(1)._2 == math.rint(log2(0.9 / u) * 1e4) / 1e4)
    assert(byFlag(0)._1 == 4)
    assert(byFlag(0)._2 ==
      math.rint(log2((1.0 - 0.9) / (1.0 - u)) * 1e4) / 1e4)
    // agreement outranks disagreement, and rows come back weight-desc
    assert(rows.head.getAs[Int]("g_f") == 1)
  }

  test("pairs never cross blocks") {
    // two blocks of 2 → exactly 2 pairs total, not C(4,2) = 6
    val recs = Seq((1L, 1, "A"), (2L, 1, "A"), (3L, 2, "A"), (4L, 2, "B"))
      .toDF("id", "blk", "f")
    val rows = Linkage.matchWeights(recs, "id", "blk", Seq(
        Linkage.CompareField("f", col("l_f") === col("r_f"), 0.9)))
      .collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 2)
  }

  test("multi-field patterns are complete and invariant to partitioning") {
    val recs = (1 to 80).map(i =>
      (i.toLong, i % 4, s"s${i % 3}", (i % 5).toLong))
    val fields = Seq(
      Linkage.CompareField("s", col("l_s") === col("r_s"), 0.95),
      Linkage.CompareField("v", col("l_v") === col("r_v"), 0.85))
    val a = Linkage.matchWeights(recs.toDF("id", "blk", "s", "v"),
      "id", "blk", fields).collect().toSeq
    val b = Linkage.matchWeights(
      scala.util.Random.shuffle(recs).toDF("id", "blk", "s", "v")
        .repartition(7), "id", "blk", fields).collect().toSeq
    assert(a == b)
    assert(a.length == 4) // all four (g_s, g_v) patterns occur
  }
}

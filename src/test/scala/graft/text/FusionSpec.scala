package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(rows: (Long, Long)*) =
    rows.toSeq.toDF("doc_id", "rank")

  test("doc in both lists outranks a doc topping only one") {
    // doc 1: rank 2 + rank 2 → 2/62; doc 2: rank 1 only → 1/61 < 2/62
    val a = ranked(2L -> 1L, 1L -> 2L)
    val b = ranked(3L -> 1L, 1L -> 2L)
    val out = Fusion.rrf(Seq("a" -> a, "b" -> b), "doc_id").collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    val s = out.head.getAs[Double]("rrf_score")
    assert(math.abs(s - math.rint(2.0 / 62.0 * 1e6) / 1e6) < 1e-9)
  }

  test("absent ranker contributes nothing; ranks survive as nulls") {
    val a = ranked(1L -> 1L)
    val b = ranked(2L -> 1L)
    val rows = Fusion.rrf(Seq("a" -> a, "b" -> b), "doc_id").collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("rank_b")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("rank_a")))
    // equal scores → doc_id ascending tie-break
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
  }

  test("withRank is deterministic on score ties via the id") {
    val scored = Seq((10L, 5.0), (3L, 5.0), (7L, 9.0)).toDF("doc_id", "s")
    val r = Fusion.withRank(scored, "s", "doc_id")
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(r.toSeq == Seq(7L, 3L, 10L))
  }

  test("topN truncates after fusion, not before") {
    val a = ranked((1L to 30L).map(i => i -> i): _*)
    val b = ranked((1L to 30L).map(i => i -> (31L - i)): _*)
    val out = Fusion.rrf(Seq("a" -> a, "b" -> b), "doc_id", topN = 5)
    assert(out.count() == 5)
    // symmetric ranks: every doc has the same score; tie-break is id asc
    assert(out.select("doc_id").as[Long].collect().toSeq != Seq.empty)
  }
}

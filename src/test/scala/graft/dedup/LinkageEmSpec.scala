package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinkageEmSpec extends SparkTestBase {
  import spark.implicits._

  // 80 duplicated entities (two records each, identical fields) mixed
  // with 240 singletons — the mixture EM is meant to pull apart
  private def records = {
    val dups = (0 until 80).flatMap(e => Seq(
      (e.toLong, e % 4, e % 7, e % 5),
      (e.toLong + 1000, e % 4, e % 7, e % 5)))
    val singles = (0 until 240).map(j =>
      (j.toLong + 5000, j % 4, (j * 3) % 7, (j * 2 + 1) % 5))
    (dups ++ singles).toDF("id", "blk", "f1", "f2")
  }

  private def fit(df: org.apache.spark.sql.DataFrame) =
    Linkage.emFit(df, "id", "blk", Seq(
      ("f1", col("l_f1") === col("r_f1")),
      ("f2", col("l_f2") === col("r_f2"))), iters = 5)

  test("EM separates match and non-match agreement rates") {
    val m = fit(records).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Double]("value")).toMap
    assert(m("m_f1") > m("u_f1"), s"m_f1 ${m("m_f1")} vs u_f1 ${m("u_f1")}")
    assert(m("m_f2") > m("u_f2"))
    assert(m("lambda") > 0 && m("lambda") < 1)
    // the all-agree pattern must carry the highest posterior
    val pats = m.filter(_._1.startsWith("pattern:"))
    assert(pats.maxBy(_._2)._1 == "pattern:11")
    assert(pats("pattern:00") < 0.5)
  }

  test("pattern census rows carry the pair counts, params carry N") {
    val rows = fit(records).collect()
    val n = rows.filter(_.getAs[String]("item").startsWith("pattern:"))
      .map(_.getAs[Double]("n")).sum
    val lambdaN = rows.find(_.getAs[String]("item") == "lambda").get
      .getAs[Double]("n")
    assert(n == lambdaN) // Σ pattern counts = N on every param row
  }

  test("deterministic across partitionings") {
    val a = fit(records).collect().toSeq
    val b = fit(records.repartition(13)).collect().toSeq
    assert(a == b)
  }
}

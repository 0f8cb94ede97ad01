package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  test("aucExact on cross-class ties matches the hand-computed rank-sum") {
    // scores: pos {1, 2, 2}, neg {0, 2}: pairs (p,n) -> pos>neg: (1,0),
    // (2a,0), (2b,0) = 3 wins; (2a,2), (2b,2) = 2 ties -> (3 + 2*0.5)/6
    val df = Seq((1.0, 1), (2.0, 1), (2.0, 1), (0.0, 0), (2.0, 0))
      .toDF("score", "y")
    val r = Calibration.aucExact(df, "score", "y").collect().head
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    // output is round(·, 6) of 4/6
    assert(r.getAs[Double]("auc") == 0.666667)
    val tied = (Seq.fill(10)((7.0, 1)) ++ Seq.fill(15)((7.0, 0)))
      .toDF("score", "y")
    assert(Calibration.aucExact(tied, "score", "y").collect().head
      .getAs[Double]("auc") == 0.5)
  }

  test("brierEce is 0 for perfect probabilities and penalizes miscalibration") {
    val perfect = (Seq.fill(40)((1.0, true)) ++ Seq.fill(60)((0.0, false)))
      .toDF("p", "y")
    val pr = Eval.brierEce(perfect, "p", col("y")).collect().head
    assert(pr.getAs[Double]("brier") == 0.0 && pr.getAs[Double]("ece") == 0.0)
    // constant p = 0.85 (bin 8), actual rate 0.5 -> ece = 0.35,
    // brier = 0.5*(0.15^2) + 0.5*(0.85^2)
    val off = (Seq.fill(50)((0.85, true)) ++ Seq.fill(50)((0.85, false)))
      .toDF("p", "y")
    val or0 = Eval.brierEce(off, "p", col("y")).collect().head
    assert(math.abs(or0.getAs[Double]("ece") - 0.35) < 1e-9)
    assert(math.abs(or0.getAs[Double]("brier")
      - (0.5 * 0.15 * 0.15 + 0.5 * 0.85 * 0.85)) < 1e-9)
  }

  test("ndcgMrr: perfect ranking scores 1/1; rank-2 first hit halves MRR") {
    // q1: rel at ranks 1,2 of 4 -> ndcg 1, mrr 1
    val q1 = Seq(("q1", 1L, 9.0, true), ("q1", 2L, 8.0, true),
      ("q1", 3L, 7.0, false), ("q1", 4L, 6.0, false))
    // q2: single rel at rank 2 -> dcg = 1/log2(3), idcg = 1, mrr = 0.5
    val q2 = Seq(("q2", 1L, 9.0, false), ("q2", 2L, 8.0, true),
      ("q2", 3L, 7.0, false))
    // q3: no rel -> excluded from both means
    val q3 = Seq(("q3", 1L, 9.0, false))
    val df = (q1 ++ q2 ++ q3).toDF("q", "id", "score", "rel")
    val r = Eval.ndcgMrr(df, "q", "score", col("rel"), "id", k = 10)
      .collect().head
    assert(r.getAs[Long]("n_queries") == 3L)
    assert(r.getAs[Long]("n_with_rel") == 2L)
    val expNdcg = (1.0 + 1.0 / (math.log(3) / math.log(2))) / 2
    assert(math.abs(r.getAs[Double]("mean_ndcg")
      - math.rint(expNdcg * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Double]("mean_mrr") == 0.75)
  }

  test("ndcgMrr truncates DCG at k but finds first_rel beyond it") {
    // rel only at rank 3 with k=2: dcg 0 -> ndcg 0, but mrr = 1/3
    val df = Seq(("q", 1L, 9.0, false), ("q", 2L, 8.0, false),
      ("q", 3L, 7.0, true)).toDF("q", "id", "score", "rel")
    val r = Eval.ndcgMrr(df, "q", "score", col("rel"), "id", k = 2)
      .collect().head
    assert(r.getAs[Double]("mean_ndcg") == 0.0)
    assert(math.abs(r.getAs[Double]("mean_mrr") - 0.333333) < 1e-6)
  }

  test("rboTopK matches the naive per-depth definition and bounds") {
    // one query, 6 items; A ranks by a desc, B by b desc (ids tie-break)
    val items = Seq((1L, 60.0, 10.0), (2L, 50.0, 60.0), (3L, 40.0, 50.0),
      (4L, 30.0, 40.0), (5L, 20.0, 30.0), (6L, 10.0, 20.0))
    val df = items.map { case (id, a, b) => ("q", id, a, b) }
      .toDF("q", "id", "a", "b")
    val out = Eval.rboTopK(df, "q", col("a"), col("b"), "id", k = 10, p = 0.9)
      .collect().head
    // naive: rank lists, overlap at each depth d, (1-p) sum p^(d-1) X_d/d
    val rankA = items.sortBy(t => (-t._2, t._1)).map(_._1)
    val rankB = items.sortBy(t => (-t._3, t._1)).map(_._1)
    val naive = 0.1 * (1 to 10).map { d =>
      val overlap = rankA.take(d).toSet.intersect(rankB.take(d).toSet).size
      math.pow(0.9, d - 1) * overlap / d
    }.sum
    assert(out.getAs[Long]("n_queries") == 1L)
    assert(math.abs(out.getAs[Double]("mean_rbo")
      - math.rint(naive * 1e6) / 1e6) < 1e-9)
    // identical rankings -> the truncated-RBO maximum; disjoint -> 0
    val same = Eval.rboTopK(df, "q", col("a"), col("a"), "id", k = 10, p = 0.9)
      .collect().head.getAs[Double]("mean_rbo")
    val maxRbo = 0.1 * (1 to 10).map(d =>
      math.pow(0.9, d - 1) * math.min(d, 6) / d).sum
    assert(math.abs(same - math.rint(maxRbo * 1e6) / 1e6) < 1e-9)
    val disjoint = (Seq.tabulate(10)(i => ("q", i.toLong, 100.0 - i, 0.0)) ++
      Seq.tabulate(10)(i => ("q", 100L + i, 0.0, 100.0 - i)))
      .toDF("q", "id", "a", "b")
    assert(Eval.rboTopK(disjoint, "q", col("a"), col("b"), "id", k = 10,
      p = 0.9).collect().head.getAs[Double]("mean_rbo") == 0.0)
  }

  test("ndcgMrr and brierEce are partition-invariant") {
    val rows = (1 to 400).map { i =>
      (s"q${i % 23}", i.toLong, ((i * 7) % 101).toDouble,
        i % 5 == 0, (i % 1000) / 1000.0)
    }
    val df = rows.toDF("q", "id", "score", "rel", "p")
    def run(d: org.apache.spark.sql.DataFrame) = Seq(
      Eval.ndcgMrr(d, "q", "score", col("rel"), "id", k = 5)
        .collect().toSeq,
      Eval.brierEce(d, "p", col("rel")).collect().toSeq)
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }

  test("looTargetEncode excludes self and nulls singletons") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0))
      .toDF("cat", "y")
    val out = Eval.looTargetEncode(df, "cat", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.find(r => r._1 == "a" && r._2 == 1.0).get._3.contains(2.5))
    assert(out.find(r => r._1 == "a" && r._2 == 3.0).get._3.contains(1.5))
    assert(out.find(_._1 == "b").get._3.isEmpty)
  }
}

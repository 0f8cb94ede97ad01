package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("cuped reduces variance when pre predicts post, preserves the grand mean") {
    // post = 2*pre + small deterministic wiggle -> theta ~ 2, big reduction
    val rows = (1 to 200).flatMap { u =>
      val pre = (u % 50).toDouble
      Seq((u.toLong, true, pre), (u.toLong, false, 2 * pre + (u % 7)))
    }
    val df = rows.toDF("user_id", "is_pre", "value")
    val out = Experiment.cuped(df, "user_id", "value",
      preCol = col("is_pre"), armCol = pmod(col("user_id"), lit(2L)))
      .collect().sortBy(_.getLong(0))
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("var_ratio") < 0.1))
    // grand mean invariance: sum(n*mean_adj) == sum(n*mean_post) up to rounding
    def grand(f: String) =
      out.map(r => r.getAs[Long]("n_units") * r.getAs[Double](f)).sum
    assert(math.abs(grand("mean_adj") - grand("mean_post")) < 1e-3)
  }

  test("cuped with a constant pre-period is a no-op (theta = 0, ratio 1)") {
    val rows = (1 to 40).flatMap(u =>
      Seq((u.toLong, true, 5.0), (u.toLong, false, (u % 9).toDouble)))
    val out = Experiment.cuped(rows.toDF("user_id", "is_pre", "value"),
      "user_id", "value", col("is_pre"), pmod(col("user_id"), lit(2L)))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("mean_adj") == r.getAs[Double]("mean_post"))
      assert(r.getAs[Double]("var_ratio") == 1.0)
    }
  }

  test("srmCheck: balanced split has chi2 0; a planted imbalance trips the flag") {
    val balanced = (1 to 300).map(u => (u.toLong, "e")).toDF("user_id", "x")
    val b = Experiment.srmCheck(balanced, "user_id",
      pmod(col("user_id"), lit(2L))).collect().head
    assert(b.getAs[Long]("n_units") == 300L)
    assert(b.getAs[Double]("chi2") == 0.0)
    assert(!b.getAs[Boolean]("srm_detected"))
    // 260 vs 40: chi2 = (110^2/150)*2 = 161.3 >> 3.841
    val skewed = (1 to 300).map(u =>
      (u.toLong, if (u <= 260) 0L else 1L)).toDF("user_id", "arm")
    val sk = Experiment.srmCheck(skewed, "user_id", col("arm"))
      .collect().head
    assert(sk.getAs[Boolean]("srm_detected"))
    assert(math.abs(sk.getAs[Double]("chi2") - 2 * 110.0 * 110.0 / 150.0) < 1e-6)
  }

  test("srmCheck counts units, not events (repeat events collapse)") {
    val df = (1 to 100).flatMap(u =>
      Seq.fill(1 + u % 5)((u.toLong, "e"))).toDF("user_id", "x")
    val r = Experiment.srmCheck(df, "user_id",
      pmod(col("user_id"), lit(2L))).collect().head
    assert(r.getAs[Long]("n_units") == 100L)
  }

  test("diffInDiff recovers a planted treatment effect exactly") {
    // control: pre 10, post 12 (trend +2); treated: pre 20, post 27
    // (trend +2, effect +5)
    val rows =
      Seq.fill(30)((false, false, 10.0)) ++ Seq.fill(25)((false, true, 12.0)) ++
        Seq.fill(20)((true, false, 20.0)) ++ Seq.fill(35)((true, true, 27.0))
    val r = Experiment.diffInDiff(rows.toDF("treat", "post", "value"),
      "value", col("treat"), col("post")).collect().head
    assert(r.getAs[Double]("did") == 5.0)
    assert(r.getAs[Long]("n_treat") == 55L && r.getAs[Long]("n_control") == 55L)
    assert(r.getAs[Double]("m_t_post") == 27.0)
  }

  test("cemAtt weights matched strata by treated count and drops unmatched ones") {
    // stratum A: 2 treated (mean 10) vs controls (mean 7) -> gap 3
    // stratum B: 1 treated (mean 5)  vs controls (mean 1) -> gap 4
    // stratum C: treated only -> excluded from ATT and common support
    val rows = Seq(
      ("A", true, 9.0), ("A", true, 11.0), ("A", false, 6.0), ("A", false, 8.0),
      ("B", true, 5.0), ("B", false, 0.0), ("B", false, 2.0),
      ("C", true, 99.0))
    val r = Experiment.cemAtt(rows.toDF("s", "treat", "value"),
      "value", col("treat"), Seq(col("s"))).collect().head
    assert(r.getAs[Long]("n_strata") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Long]("treated_matched") == 3L)
    // att = (2*3 + 1*4) / 3 = 10/3
    assert(math.abs(r.getAs[Double]("att") - 10.0 / 3) < 1e-6)
  }

  test("proportionTest matches the hand-computed pooled z and guards zero variance") {
    // arm A: 30/100, arm B: 20/100 -> pooled 0.25,
    // z = 0.1 / sqrt(0.25*0.75*0.02) = 1.632993 (< 1.96)
    val rows = Seq.tabulate(100)(i => ("g", 0L, i < 30)) ++
      Seq.tabulate(100)(i => ("g", 1L, i < 20))
    val r = Experiment.proportionTest(rows.toDF("g", "arm", "ok"),
      "g", col("ok"), col("arm") === 0).collect().head
    assert(r.getAs[Double]("p_a") == 0.3 && r.getAs[Double]("p_b") == 0.2)
    assert(r.getAs[Double]("z_stat") == 1.632993)
    assert(!r.getAs[Boolean]("significant"))
    // all-success pool: se = 0 -> z pinned to 0, no division error
    val allOk = Seq.tabulate(40)(i => ("g", (i % 2).toLong, true))
      .toDF("g", "arm", "ok")
    assert(Experiment.proportionTest(allOk, "g", col("ok"),
      col("arm") === 0).collect().head.getAs[Double]("z_stat") == 0.0)
  }

  test("mantelHaenszel pools the per-stratum odds products") {
    // S1: a=10 b=10 c=5 d=25 (n=50) -> ad/n=5, bc/n=1
    // S2: a=4 b=16 c=2 d=28 (n=50) -> ad/n=2.24, bc/n=0.64
    // OR = 7.24/1.64 = 4.414634, ln = 1.484925
    def cell(s: String, t: Boolean, ok: Boolean, k: Int) =
      Seq.fill(k)((s, t, ok))
    val rows = cell("s1", true, true, 10) ++ cell("s1", true, false, 10) ++
      cell("s1", false, true, 5) ++ cell("s1", false, false, 25) ++
      cell("s2", true, true, 4) ++ cell("s2", true, false, 16) ++
      cell("s2", false, true, 2) ++ cell("s2", false, false, 28)
    val r = Experiment.mantelHaenszel(rows.toDF("s", "t", "ok"),
      col("t"), col("ok"), Seq(col("s"))).collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("tot_treat_succ") == 14L)
    assert(r.getAs[Double]("or_mh") == 4.414634)
    assert(r.getAs[Double]("log_or_mh") == 1.484925)
  }

  test("upliftBuckets ranks by score desc and nulls one-armed buckets") {
    def batch(p: Double, t: Boolean, ok: Boolean, k: Int) =
      Seq.fill(k)((p, t, ok))
    val rows =
      batch(0.95, true, true, 8) ++ batch(0.95, true, false, 2) ++
        batch(0.95, false, true, 2) ++ batch(0.95, false, false, 8) ++
        batch(0.55, true, false, 5) ++ // treat-only bucket
        batch(0.15, true, true, 3) ++ batch(0.15, true, false, 7) ++
        batch(0.15, false, true, 3) ++ batch(0.15, false, false, 7)
    val out = Experiment.upliftBuckets(rows.toDF("p", "t", "ok"),
      "p", col("t"), col("ok")).collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq == Seq(9L, 5L, 1L))
    assert(out(0).getAs[Double]("uplift") == 0.6)
    assert(out(1).isNullAt(out(1).fieldIndex("uplift"))) // no controls
    assert(out(2).getAs[Double]("uplift") == 0.0)
    // qini: 8-2*(10/10)=6; 8-2*(15/10)=5; 11-5*(25/20)=4.75
    assert(out.map(_.getAs[Double]("qini_cum")).toSeq == Seq(6.0, 5.0, 4.75))
  }

  test("one-armed groups drop from proportionTest/mde; zero denominator nulls the ratio") {
    // group "solo" has only arm-A rows -> no test to run
    val rows = Seq(("g", 0L, true), ("g", 1L, false), ("solo", 0L, true),
      ("solo", 0L, true))
    val df = rows.toDF("g", "arm", "ok")
    val pt = Experiment.proportionTest(df, "g", col("ok"), col("arm") === 0)
    assert(pt.collect().map(_.getString(0)).toSeq == Seq("g"))
    val md = Experiment.mde(
      rows.map { case (g, a, _) => (g, a, 1.0) }.toDF("g", "arm", "value"),
      "g", "value", col("arm") === 0)
    assert(md.collect().map(_.getString(0)).toSeq == Seq("g"))
    // all-zero denominator: ratio/se/CI are NULL, never a /0 throw
    val zero = Seq((1L, 5.0, 0.0), (2L, 3.0, 0.0)).toDF("u", "x", "y")
    val zr = Experiment.ratioDeltaMethod(zero, "u", col("x"), col("y"))
      .collect().head
    assert(zr.isNullAt(zr.fieldIndex("ratio")) && zr.isNullAt(zr.fieldIndex("se")))
  }

  test("ratioDeltaMethod matches the hand case and handles constant denominators") {
    // units: x = {2, 4, 0}, y = {2, 2, 2} -> R = 1, sxx = 4, syy = sxy = 0,
    // se = sqrt(4 / (3*4)) = 0.57735
    val rows = Seq((1L, 2.0, 1.0), (1L, 0.0, 1.0), (2L, 4.0, 1.0),
      (2L, 0.0, 1.0), (3L, 0.0, 1.0), (3L, 0.0, 1.0))
    val r = Experiment.ratioDeltaMethod(rows.toDF("u", "x", "y"),
      "u", col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Double]("ratio") == 1.0)
    assert(r.getAs[Double]("se") == 0.57735)
    assert(r.getAs[Double]("ci_lo") == -0.131586)
    assert(r.getAs[Double]("ci_hi") == 2.131586)
  }

  test("postStratifiedMean re-weights to population shares and reports coverage") {
    // A: pop 6, sampled rows mean 10; B: pop 4, sampled mean 20;
    // C: pop 10, UNSAMPLED -> poststrat = (6*10 + 4*20)/10 = 14,
    // covered = 10/20; naive = (2*10 + 1*20)/3
    val rows =
      Seq.fill(4)(("A", 10.0, false)) ++ Seq.fill(2)(("A", 10.0, true)) ++
        Seq.fill(3)(("B", 20.0, false)) ++ Seq(("B", 20.0, true)) ++
        Seq.fill(10)(("C", 99.0, false))
    val r = Experiment.postStratifiedMean(rows.toDF("s", "v", "in_s"),
      "s", "v", col("in_s")).collect().head
    assert(r.getAs[Long]("n_sample") == 3L)
    assert(r.getAs[Double]("naive_mean") == 13.333333)
    assert(r.getAs[Double]("poststrat_mean") == 14.0)
    assert(r.getAs[Double]("covered_share") == 0.5)
  }

  test("round-10 experiment operators are partition-invariant") {
    val rows = (1 to 500).map { i =>
      (i.toLong % 97, (i % 37).toDouble, i % 3 == 0, i % 2 == 0,
        (i % 1000) / 1000.0, s"g${i % 5}")
    }
    val df = rows.toDF("u", "v", "pre", "tr", "p", "g")
    def run(d: org.apache.spark.sql.DataFrame) = Seq(
      Experiment.cuped(d, "u", "v", col("pre"), pmod(col("u"), lit(2L)))
        .collect().toSeq,
      Experiment.proportionTest(d, "g", col("v") > 18, col("tr"))
        .collect().toSeq,
      Experiment.mantelHaenszel(d, col("tr"), col("v") > 18, Seq(col("g")))
        .collect().toSeq,
      Experiment.upliftBuckets(d, "p", col("tr"), col("v") > 18)
        .collect().toSeq,
      Experiment.cemAtt(d, "v", col("tr"), Seq(col("g")))
        .collect().toSeq,
      Experiment.ratioDeltaMethod(d, "u", col("v"), lit(1.0))
        .collect().toSeq,
      Experiment.postStratifiedMean(d, "g", "v", col("tr"))
        .collect().toSeq)
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }

  test("mde scales as 1/sqrt(n) and is 0 for a constant metric") {
    def frame(n: Int) = (1 to n).map(i =>
      ("g", i.toLong, (i % 10).toDouble)).toDF("g", "user_id", "value")
    val small = Experiment.mde(frame(100), "g", "value",
      pmod(col("user_id"), lit(2L)) === 0).collect().head
    val big = Experiment.mde(frame(400), "g", "value",
      pmod(col("user_id"), lit(2L)) === 0).collect().head
    // same per-element variance, 4x the n -> half the MDE (ratio 2 up to
    // the tiny var_samp n/(n-1) drift and rounding)
    val ratio = small.getAs[Double]("mde_abs") / big.getAs[Double]("mde_abs")
    assert(math.abs(ratio - 2.0) < 0.02)
    val const = (1 to 50).map(i => ("g", i.toLong, 3.0))
      .toDF("g", "user_id", "value")
    val c = Experiment.mde(const, "g", "value",
      pmod(col("user_id"), lit(2L)) === 0).collect().head
    assert(c.getAs[Double]("mde_abs") == 0.0)
  }
}

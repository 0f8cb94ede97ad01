package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ForecastSpec extends SparkTestBase {
  import spark.implicits._

  test("holt reproduces a hand-stepped recurrence") {
    // α = β = 0.5, series 10, 12, 14:
    //   init l=10, b=0
    //   t2: err 2   → sse 4;     l = .5·12 + .5·10   = 11,    b = .5·1 + 0 = .5
    //   t3: err 2.5 → sse 10.25; l = .5·14 + .5·11.5 = 12.75, b = .5·1.75 + .25 = 1.125
    val df = Seq(("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 14.0))
      .toDF("k", "o", "y")
    val r = Forecast.holt(df, "k", "o", "y", alpha = 0.5, beta = 0.5)
      .collect().head
    assert(r.getAs[Long]("n_obs") == 3)
    assert(r.getAs[Double]("level") == 12.75)
    assert(r.getAs[Double]("trend") == 1.125)
    assert(r.getAs[Double]("sse") == 10.25)
    assert(r.getAs[Double]("fcst_1") == 13.875)
    assert(r.getAs[Double]("fcst_2") == 15.0)
    assert(r.getAs[Double]("fcst_3") == 16.125)
  }

  test("holt handles a length-1 series (level only, no steps)") {
    val r = Forecast.holt(Seq(("a", 1, 7.0)).toDF("k", "o", "y"),
      "k", "o", "y").collect().head
    assert(r.getAs[Long]("n_obs") == 1)
    assert(r.getAs[Double]("level") == 7.0)
    assert(r.getAs[Double]("trend") == 0.0)
    assert(r.getAs[Double]("sse") == 0.0)
  }

  test("holt is invariant to input partitioning and row order") {
    val base = (1 to 200).map(i =>
      (s"k${i % 5}", i, math.sin(i * 0.37) * 50 + i * 0.2))
    val a = Forecast.holt(base.toDF("k", "o", "y"), "k", "o", "y")
      .collect().toSeq
    val b = Forecast.holt(
        scala.util.Random.shuffle(base).toDF("k", "o", "y").repartition(13),
        "k", "o", "y")
      .collect().toSeq
    assert(a == b)
  }

  test("seasonalNaiveMase on a hand case") {
    // season 2, series 1..6: |y_t − y_{t−2}| = 2 for t=3..6 → mae 2;
    // |y_t − y_{t−1}| = 1 for t=2..6 → mae 1; mase = 2
    val df = (1 to 6).map(i => ("a", i, i.toDouble)).toDF("k", "o", "y")
    val r = Forecast.seasonalNaiveMase(df, "k", "o", "y", season = 2)
      .collect().head
    assert(r.getAs[Long]("n_scored") == 4)
    assert(r.getAs[Double]("mae_seasonal") == 2.0)
    assert(r.getAs[Double]("mae_naive1") == 1.0)
    assert(r.getAs[Double]("mase") == 2.0)
  }

  test("seasonalDecompose recovers an exact additive trend + season") {
    // y = rn + s[(rn−1) % 3] with s = (3, −1, −2): every full 3-window
    // average is exactly the linear trend, so detrended = s(phase) and
    // the zero-centered indices come back exactly
    val s = Seq(3.0, -1.0, -2.0)
    val df = (1 to 9).map(rn => ("a", rn, rn + s((rn - 1) % 3)))
      .toDF("k", "o", "y")
    val rows = Forecast.seasonalDecompose(df, "k", "o", "y", period = 3)
      .collect()
    val m = rows.map(r => r.getAs[Int]("phase") ->
      (r.getAs[Long]("n_obs"), r.getAs[Double]("seasonal_index"))).toMap
    assert(m(0) == ((2L, 3.0)))
    assert(m(1) == ((3L, -1.0)))
    assert(m(2) == ((2L, -2.0)))
  }

  test("seasonalDecompose is invariant to partitioning") {
    val base = (1 to 140).map(i =>
      (s"k${i % 2}", i, 10.0 + (i % 7) * 2 + i * 0.1))
    val a = Forecast.seasonalDecompose(base.toDF("k", "o", "y"),
      "k", "o", "y", period = 7).collect().toSeq
    val b = Forecast.seasonalDecompose(
      scala.util.Random.shuffle(base).toDF("k", "o", "y").repartition(9),
      "k", "o", "y", period = 7).collect().toSeq
    assert(a == b)
  }

  test("seasonalNaiveMase flags a perfectly seasonal series as MASE 0") {
    val df = (0 until 28).map(i => ("a", i, (i % 7).toDouble))
      .toDF("k", "o", "y")
    val r = Forecast.seasonalNaiveMase(df, "k", "o", "y", season = 7)
      .collect().head
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mase") == 0.0)
  }

  test("crossCorrelation peaks at the planted lag") {
    // y volume = x volume shifted 2 days later → CCF exactly 1 at lag 2
    def t(day: Int, k: Int) =
      java.sql.Timestamp.valueOf(f"2024-05-${day + 1}%02d ${10 + k}%02d:00:00")
    // aperiodic volumes — a d%5 pattern would ALSO align at lag 2−5
    val vol = Seq(1, 3, 2, 5, 4, 2, 1, 5, 3, 4, 1, 2, 5, 3).zipWithIndex
      .map { case (n, d) => d -> n }
    val ev = vol.flatMap { case (d, n) =>
      (0 until n).map(k => ("click", t(d, k))) ++
        (0 until n).map(k => ("purchase", t(d + 2, k)))
    }.toDF("event_type", "ts")
    val r = Forecast.crossCorrelation(ev, "ts", "event_type",
      "click", "purchase", maxLag = 3)
      .collect().map(x => x.getInt(0) -> x.getDouble(2)).toMap
    assert(r(2) == 1.0)
    assert(r.filterNot(_._1 == 2).values.forall(_ < 1.0))
  }

  test("crossCorrelation yields NULL, not NaN, for degenerate lags") {
    // constant x volume → zero variance → corr undefined; SQL engines
    // (the oracle) emit NULL there, so the engine must too
    def t(day: Int, k: Int) =
      java.sql.Timestamp.valueOf(f"2024-06-${day + 1}%02d ${10 + k}%02d:00:00")
    val ev = (0 until 8).flatMap { d =>
      (0 until 3).map(k => ("click", t(d, k))) ++
        (0 until (d % 4) + 1).map(k => ("purchase", t(d, k)))
    }.toDF("event_type", "ts")
    val r = Forecast.crossCorrelation(ev, "ts", "event_type",
      "click", "purchase", maxLag = 1).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val ccf = Option(x.get(2)).map(_.asInstanceOf[Double])
      assert(ccf.forall(v => !v.isNaN), s"lag ${x.get(0)}: NaN leaked")
      assert(ccf.isEmpty, s"constant x series must yield NULL ccf, got $ccf")
    }
  }

  test("periodOverPeriod aligns on the calendar, not row order") {
    def d(m: String) = java.sql.Timestamp.valueOf(s"$m-15 00:00:00")
    // 2023-12 missing → 2024-01 has NULL MoM but a real YoY
    val df = Seq(("2023-01", 100.0), ("2023-02", 110.0), ("2023-11", 50.0),
      ("2024-01", 150.0)).map { case (m, v) => (d(m), v) }
      .toDF("dt", "v")
    val r = Forecast.periodOverPeriod(df, "dt", "v").collect()
      .map(x => (x.getString(0), x.getDouble(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(r == Seq(
      ("2023-01", 100.0, None, None),
      ("2023-02", 110.0, Some(0.1), None),
      ("2023-11", 50.0, None, None),
      ("2024-01", 150.0, None, Some(0.5))))
  }
}

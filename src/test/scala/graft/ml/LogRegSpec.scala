package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  // linearly separated fixture: y = 1 iff x > 0, symmetric values so
  // the standardized feature keeps its sign structure
  private def fixture = Seq(
    (-3.0, 0), (-2.0, 0), (-1.0, 0), (1.0, 1), (2.0, 1), (3.0, 1)
  ).toDF("x", "y")

  test("GD moves the weight toward the separating direction and cuts loss") {
    val one = LogReg.fitGd(fixture, "y", Seq("x"), iters = 1, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = LogReg.fitGd(fixture, "y", Seq("x"), iters = 6, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one("w_x") > 0.0)          // gradient points the right way
    assert(many("w_x") > one("w_x"))  // keeps climbing
    assert(many("log_loss") < one("log_loss")) // loss decreases
    assert(math.abs(many("intercept")) < 1e-6) // symmetric data: b stays 0
  }

  test("zero start: one round equals lr * mean((y - 0.5) * x) ascent") {
    // at w = 0 every sigmoid is 0.5, so grad_j = avg((0.5 - y) * x_j);
    // verify against a hand computation on the standardized feature
    val mu = 0.0
    val sd = math.sqrt(Seq(-3.0, -2.0, -1.0, 1.0, 2.0, 3.0)
      .map(v => v * v).sum / 6.0)
    val xs = Seq(-3.0, -2.0, -1.0, 1.0, 2.0, 3.0).map(v => (v - mu) / sd)
    val ys = Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    val grad = xs.zip(ys).map { case (x, y) => (0.5 - y) * x }.sum / 6.0
    val expected = -0.5 * grad
    val got = LogReg.fitGd(fixture, "y", Seq("x"), iters = 1, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("w_x") - expected) < 1e-6)
  }

  test("result is invariant to input partitioning") {
    val base = fixture
    val a = LogReg.fitGd(base.repartition(1), "y", Seq("x"), 3, 0.5).collect()
    val b = LogReg.fitGd(base.repartition(7), "y", Seq("x"), 3, 0.5).collect()
    assert(a.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("kfold: folds partition the data; eval uses train moments") {
    import org.apache.spark.sql.functions._
    val df = (1 to 30).map(i =>
      (i.toLong, i.toDouble - 15.5, if (i > 15) 1 else 0))
      .toDF("id", "x", "y")
    val out = LogReg.kfoldLogLoss(df, "y", Seq("x"),
      foldCol = pmod(col("id"), lit(3)), k = 3, iters = 2)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getLong(2)).sum == 30)          // eval rows partition
    out.foreach(r => assert(r.getLong(1) + r.getLong(2) == 30))
    // separable data: held-out loss beats the ln(2) ~ 0.693 zero-model
    out.foreach(r => assert(r.getDouble(3) < 0.693))
  }

  test("multi-feature: irrelevant constant-ish feature gets ~zero weight") {
    // noise has identical per-class distribution → exactly zero gradient
    val df = Seq(
      (-3.0, 1.0, 0), (-2.0, -1.0, 0), (-1.0, 0.0, 0),
      (1.0, 1.0, 1), (2.0, -1.0, 1), (3.0, 0.0, 1)
    ).toDF("x", "noise", "y")
    val m = LogReg.fitGd(df, "y", Seq("x", "noise"), iters = 4, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("w_x") > 0.3)
    assert(math.abs(m("w_noise")) < 0.1)
  }
}

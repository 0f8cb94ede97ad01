package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-regressor ordinary least squares by normal equations, solved in
  * covariance form — multiple regression as ONE partial→final
  * aggregation pass plus constant-size closed-form algebra, the way a
  * distributed engine should fit small-dimension linear models (the
  * d×d Gram route in [[graft.similarity.Covariance]] generalizes this
  * to arbitrary d; at d = 2 the inverse is writable as expressions, so
  * the whole fit stays declarative and codegen'd with NO driver math
  * at all — the coefficients are columns of a one-row DataFrame).
  *
  * Math: centering the system turns X'X β = X'y into
  * Cov(X) β = cov(X, y); for d = 2,
  * β₁ = (v₂·c₁ᵧ − c₁₂·c₂ᵧ)/det, β₂ = (v₁·c₂ᵧ − c₁₂·c₁ᵧ)/det with
  * det = v₁v₂ − c₁₂², intercept = ȳ − β₁x̄₁ − β₂x̄₂, and
  * R² = (β₁c₁ᵧ + β₂c₂ᵧ)/var(y). The covariance form is numerically
  * far better conditioned than raw Σx², Σxy sums (no catastrophic
  * cancellation between near-equal large products), which is what
  * lets a 6-decimal rounding pin the result against an oracle that
  * sums in a different order.
  */
object MultiOls {

  /** Fit y ~ b0 + b1·x1 + b2·x2; returns one row
    * (b0, b1, b2, r2) rounded to `digits`. Requires non-collinear
    * regressors (det ≠ 0) — collinear inputs yield nulls, not a crash,
    * matching SQL division semantics. */
  def ols2(df: DataFrame, y: Column, x1: Column, x2: Column,
           digits: Int = 6): DataFrame = {
    val moments = df.select(y.cast("double").as("y"),
        x1.cast("double").as("x1"), x2.cast("double").as("x2"))
      .agg(
        covar_pop(col("x1"), col("y")).as("c1y"),
        covar_pop(col("x2"), col("y")).as("c2y"),
        covar_pop(col("x1"), col("x2")).as("c12"),
        var_pop(col("x1")).as("v1"),
        var_pop(col("x2")).as("v2"),
        var_pop(col("y")).as("vy"),
        avg(col("y")).as("my"), avg(col("x1")).as("m1"),
        avg(col("x2")).as("m2"))
    val det = col("v1") * col("v2") - col("c12") * col("c12")
    val b1 = (col("v2") * col("c1y") - col("c12") * col("c2y")) / det
    val b2 = (col("v1") * col("c2y") - col("c12") * col("c1y")) / det
    moments
      .withColumn("_b1", b1).withColumn("_b2", b2)
      .select(
        round(col("my") - col("_b1") * col("m1") - col("_b2") * col("m2"),
          digits).as("b0"),
        round(col("_b1"), digits).as("b1"),
        round(col("_b2"), digits).as("b2"),
        round((col("_b1") * col("c1y") + col("_b2") * col("c2y")) / col("vy"),
          digits).as("r2"))
  }
}

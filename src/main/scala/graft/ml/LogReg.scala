package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Binary logistic regression by full-batch gradient descent — the
  * classifier tier between [[NaiveBayes]] (count-based, one pass) and
  * an external ML stack: a quality/toxicity/served-page classifier a
  * curation pipeline trains ON the cluster with nothing but
  * aggregations.
  *
  * Each GD round is ONE partial→final aggregation producing d+1
  * doubles (the mean gradient), so the per-round cost at 100 TB is a
  * single map-side-combined pass over the cached standardized feature
  * projection — no per-row state, no driver-side data, weights live in
  * a 1-row broadcast. `iters` rounds = `iters` passes; the feature
  * projection is persisted once (bytes per row = d doubles + label,
  * NOT the source table width).
  *
  * Determinism: features are standardized with population moments from
  * one aggregation; the gradient is `avg((sigmoid(w·x) − y) · x)` —
  * all smooth arithmetic, so engine-order float drift stays ~1 ulp per
  * round and the rounded (6 dp) outputs are stable across engines and
  * partitionings. The model is reported as `(term, value)` rows plus
  * the final train log-loss (smooth — no threshold flip-flops near a
  * decision boundary can perturb it).
  */
object LogReg {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(negate(z)))

  /** The standardized feature projection + final GD weights — the
    * shared core of [[fitGd]] (reports the model) and [[fitAndScore]]
    * (applies it). Returns the persisted feature frame (caller
    * unpersists), the weight vector (index d = intercept), and the
    * margin builder. */
  private def fitCore(df: DataFrame, labelCol: String,
                      featureCols: Seq[String], iters: Int, lr: Double)
      : (DataFrame, Array[Double], Array[Double] => Column) = {
    require(featureCols.nonEmpty, "logreg: need at least one feature")
    require(iters >= 1 && lr > 0, s"logreg: invalid iters=$iters lr=$lr")
    val spark = df.sparkSession
    import spark.implicits._

    val d = featureCols.length
    // one aggregation for all standardization moments
    val momAgg = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mu_$c"), stddev_pop(col(c)).as(s"sd_$c")))
    val mom = df.agg(momAgg.head, momAgg.tail: _*).head()
    val feats = df.select(
      col(labelCol).cast("double").as("_y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          ((col(c) - mom.getDouble(2 * i)) / mom.getDouble(2 * i + 1))
            .as(s"_x$i")
        }: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    def margin(w: Array[Double]): Column =
      (0 until d).foldLeft(lit(w(d)): Column) { (acc, i) =>
        acc + col(s"_x$i") * w(i)
      }

    // weights = d features + intercept at index d; each round collects
    // ONE (d+1)-double aggregate row — bounded driver state, like any
    // scalar-aggregate broadcast
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iters) {
      val err = sigmoid(margin(w)) - col("_y")
      val gradAgg = (0 until d).map(i => avg(err * col(s"_x$i"))) :+ avg(err)
      val g = feats.agg(gradAgg.head.as("g0"),
        gradAgg.tail.zipWithIndex.map { case (c, i) => c.as(s"g${i + 1}") }: _*)
        .head()
      w = w.indices.map(i => w(i) - lr * g.getDouble(i)).toArray
    }

    (feats, w, margin)
  }

  /** Fit by `iters` rounds of full-batch GD with learning rate `lr`
    * from a zero start, over POPULATION-standardized `featureCols`;
    * returns `(term, value)` rows: `w_<feature>` weights, `intercept`,
    * and `log_loss` at the final weights (natural log, mean over rows).
    * `labelCol` must be 0/1 (cast to double). */
  def fitGd(df: DataFrame, labelCol: String, featureCols: Seq[String],
            iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (feats, w, margin) = fitCore(df, labelCol, featureCols, iters, lr)
    val d = featureCols.length
    val m = margin(w)
    // ln(1 + e^{-|m|}) + max(-ym', 0) form is unnecessary at these
    // magnitudes; standardized features keep |m| small enough that the
    // direct smooth form is exact in double
    val loss = feats.agg(
      avg(when(col("_y") === 1.0, log(lit(1.0) + exp(negate(m))))
        .otherwise(log(lit(1.0) + exp(m)))).as("ll"))
      .head().getDouble(0)
    feats.unpersist()

    val rows = featureCols.zipWithIndex.map { case (c, i) =>
      (s"w_$c", w(i))
    } ++ Seq(("intercept", w(d)), ("log_loss", loss))
    rows.toDF("term", "_raw")
      .select(col("term"), round(col("_raw"), 6).as("value"))
      .orderBy("term")
  }

  /** Fit as [[fitGd]], then score every row: returns `(label, p)` —
    * the frame [[Calibration.reliabilityBins]] consumes. The scoring
    * pass reuses the persisted standardized projection (it stays
    * cached for the consumer's action — narrow d+1-column rows; the
    * session evicts it LRU), so fit + score is iters+2 passes. */
  def fitAndScore(df: DataFrame, labelCol: String, featureCols: Seq[String],
                  iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val (feats, w, margin) = fitCore(df, labelCol, featureCols, iters, lr)
    feats.select(col("_y").as("label"), sigmoid(margin(w)).as("p"))
  }
}

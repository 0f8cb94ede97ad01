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

  /** `(_y, _x0.._x{d-1})` projection standardized with the GIVEN
    * moments — split out so held-out folds standardize with TRAIN
    * moments ([[kfoldLogLoss]]), never their own. */
  private def standardized(df: DataFrame, labelCol: String,
                           featureCols: Seq[String],
                           moments: Seq[(Double, Double)]): DataFrame =
    df.select(
      col(labelCol).cast("double").as("_y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          ((col(c) - moments(i)._1) / moments(i)._2).as(s"_x$i")
        }: _*)

  private def margin(w: Array[Double], d: Int): Column =
    (0 until d).foldLeft(lit(w(d)): Column) { (acc, i) =>
      acc + col(s"_x$i") * w(i)
    }

  // ln(1 + e^{-|m|}) + max(-ym', 0) form is unnecessary at these
  // magnitudes; standardized features keep |m| small enough that the
  // direct smooth form is exact in double
  private def logLossOf(m: Column): Column =
    avg(when(col("_y") === 1.0, log(lit(1.0) + exp(negate(m))))
      .otherwise(log(lit(1.0) + exp(m))))

  /** The standardized feature projection + final GD weights — the
    * shared core of [[fitGd]] (reports the model), [[fitAndScore]]
    * (applies it), and [[kfoldLogLoss]] (per-fold). Returns the
    * persisted feature frame (caller unpersists), the weight vector
    * (index d = intercept), and the train moments. */
  private def fitCore(df: DataFrame, labelCol: String,
                      featureCols: Seq[String], iters: Int, lr: Double)
      : (DataFrame, Array[Double], Seq[(Double, Double)]) = {
    require(featureCols.nonEmpty, "logreg: need at least one feature")
    require(iters >= 1 && lr > 0, s"logreg: invalid iters=$iters lr=$lr")

    val d = featureCols.length
    // one aggregation for all standardization moments
    val momAgg = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mu_$c"), stddev_pop(col(c)).as(s"sd_$c")))
    val mom = df.agg(momAgg.head, momAgg.tail: _*).head()
    val moments = featureCols.indices
      .map(i => (mom.getDouble(2 * i), mom.getDouble(2 * i + 1)))
    val feats = standardized(df, labelCol, featureCols, moments)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // weights = d features + intercept at index d; each round collects
    // ONE (d+1)-double aggregate row — bounded driver state, like any
    // scalar-aggregate broadcast
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iters) {
      val err = sigmoid(margin(w, d)) - col("_y")
      val gradAgg = (0 until d).map(i => avg(err * col(s"_x$i"))) :+ avg(err)
      val g = feats.agg(gradAgg.head.as("g0"),
        gradAgg.tail.zipWithIndex.map { case (c, i) => c.as(s"g${i + 1}") }: _*)
        .head()
      w = w.indices.map(i => w(i) - lr * g.getDouble(i)).toArray
    }

    (feats, w, moments)
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
    val (feats, w, _) = fitCore(df, labelCol, featureCols, iters, lr)
    val d = featureCols.length
    val loss = feats.agg(logLossOf(margin(w, d)).as("ll"))
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
    val (feats, w, _) = fitCore(df, labelCol, featureCols, iters, lr)
    feats.select(col("_y").as("label"),
      sigmoid(margin(w, featureCols.length)).as("p"))
  }

  /** K-fold cross-validated evaluation: rows are assigned to folds by
    * the caller-supplied DETERMINISTIC `foldCol` (values `0..k-1` — a
    * hash or arithmetic function of stable row keys, never random());
    * for each fold the model trains on the OTHER folds (own moments,
    * own GD trajectory) and reports held-out mean log-loss. The
    * held-out rows standardize with the TRAIN moments — the honest CV
    * protocol; letting eval rows see their own moments leaks.
    *
    * Cost: the labeled projection persists once and every fold's
    * train/eval filters scan the cache, so the whole CV is
    * k·(iters+2)+1 cached passes; driver state stays (d+1) doubles per
    * fold. Output: one row per fold `(fold, n_train, n_eval,
    * eval_log_loss)` ordered by fold. */
  def kfoldLogLoss(df: DataFrame, labelCol: String,
                   featureCols: Seq[String], foldCol: Column, k: Int = 3,
                   iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(k >= 2, s"logreg cv: need k >= 2 folds, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val d = featureCols.length
    val base = df.select(col(labelCol).cast("double").as(labelCol) +:
        foldCol.cast("int").as("_fold") +: featureCols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = (0 until k).map { f =>
      val (train, w, moments) = fitCore(base.filter(col("_fold") =!= f),
        labelCol, featureCols, iters, lr)
      val nTrain = train.count()
      train.unpersist()
      val eval = standardized(base.filter(col("_fold") === f),
        labelCol, featureCols, moments)
      val r = eval.agg(count(lit(1)).as("n"),
        logLossOf(margin(w, d)).as("ll")).head()
      (f, nTrain, r.getLong(0), r.getDouble(1))
    }
    base.unpersist()
    rows.toDF("fold", "n_train", "n_eval", "_ll")
      .select(col("fold"), col("n_train"), col("n_eval"),
        round(col("_ll"), 6).as("eval_log_loss"))
      .orderBy("fold")
  }
}

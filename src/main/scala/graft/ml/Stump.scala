package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-based decision-stump split finding — the core primitive of
  * gradient-boosted-tree training at scale (LightGBM's and XGBoost's
  * "hist" mode; Ke et al. 2017 §2.1): bin each feature once, aggregate
  * per-bin label statistics partial→final, then evaluate every
  * candidate split on the TINY (features × bins) statistics table.
  *
  * Scale shape: the corpus is touched by exactly ONE scan + one
  * HashAggregate keyed by (feature, bin) — state is features·bins rows
  * of three longs regardless of row count. The cumulative sums and the
  * gain argmax run windowed over that statistics table (cardinality
  * features·bins, hundreds of rows at any data scale), so the only
  * per-row work is the binning arithmetic, fully codegen'd. This is why
  * hist-mode GBT trains on billions of rows: candidate evaluation never
  * sees the data again.
  */
object Stump {

  /** One candidate feature: display name, value column, and a fixed
    * binning range [lo, hi) cut into `bins` equal-width bins (values
    * clamp into the edge bins, mirroring LightGBM's bin-edge clamping). */
  final case class Feature(name: String, value: Column, lo: Double,
                           hi: Double, bins: Int)

  /** Gini impurity 1 − p² − (1−p)² of a (pos, n) pair, as expressions. */
  private def gini(pos: Column, n: Column): Column = {
    val p = pos.cast("double") / n.cast("double")
    lit(1.0) - p * p - (lit(1.0) - p) * (lit(1.0) - p)
  }

  /** Two-round discrete AdaBoost over stumps with INTEGER weight
    * doubling — boosting's iterated-reweighted-fit loop in the exact
    * regime: round 1 fits the best stump on unit weights; every row the
    * stump misclassifies doubles its weight; round 2 fits the best
    * WEIGHTED stump. Because weights stay integers (1, 2, 4, …), every
    * histogram statistic remains exact integer arithmetic and the whole
    * boosting trajectory is reproducible bit-for-bit cross-engine —
    * only the final Gini gains are floats.
    *
    * Scale shape: per round, ONE corpus scan (the weighted histogram,
    * same single explode+HashAggregate as [[bestSplits]]) plus a 1-row
    * broadcast of the round's winning stump back onto the corpus for
    * the reweighting — the gradient-boosting cost model exactly: R
    * rounds = R scans, no driver-side data, the model is R one-row
    * frames. Output: one row per round — (round, feature, threshold,
    * w_left, w_right, gain) where w_* are the weighted side masses. */
  def boostedSplits(df: DataFrame, labelCol: String,
                    features: Seq[Feature], rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    var weighted = df.withColumn("_w", lit(1L))
    var out: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val win = weightedBestSplit(weighted, labelCol, features)
        .withColumn("round", lit(r))
      val winRow = win.select("round", "feature", "threshold",
        "w_left", "w_right", "gain")
      out = if (out == null) winRow else out.unionByName(winRow)
      if (r < rounds) {
        // 1-row broadcast: predict with the winner, double the misses.
        // maj_l/maj_r ride along from the histogram, so prediction is
        // pure expressions — no second model pass.
        val featVal = features.tail.foldLeft(
          features.head.value.cast("double")) { (acc, f) =>
          when(col("feature") === f.name, f.value.cast("double"))
            .otherwise(acc)
        }
        weighted = weighted.crossJoin(
            broadcast(win.select("feature", "threshold", "maj_l", "maj_r")))
          .withColumn("_pred",
            when(featVal <= col("threshold"), col("maj_l"))
              .otherwise(col("maj_r")))
          .withColumn("_w",
            when(col("_pred") =!= col(labelCol).cast("long"),
              col("_w") * 2).otherwise(col("_w")))
          .drop("feature", "threshold", "maj_l", "maj_r", "_pred")
          .localCheckpoint(eager = false)
      }
      r += 1
    }
    out.orderBy("round")
  }

  /** The single best weighted stump as a 1-row frame, with the side
    * majorities (`maj_l`, `maj_r`) needed to predict with it. Weighted
    * twin of [[bestSplits]]'s top-1: identical histogram shape, `sum(w)`
    * replacing `count`. */
  private def weightedBestSplit(df: DataFrame, labelCol: String,
                                features: Seq[Feature]): DataFrame = {
    val binStructs = array(features.map { f =>
      val w = (f.hi - f.lo) / f.bins
      val raw = floor((f.value.cast("double") - lit(f.lo)) / lit(w))
      val bin = least(greatest(raw, lit(0.0)), lit((f.bins - 1).toDouble))
        .cast("long")
      struct(lit(f.name).as("feature"), bin.as("bin"))
    }: _*)
    val stats = df
      .select(explode(binStructs).as("fb"),
        col(labelCol).cast("long").as("_y"), col("_w"))
      .groupBy(col("fb.feature").as("feature"), col("fb.bin").as("bin"))
      .agg(sum("_w").as("n"), sum(col("_w") * col("_y")).as("pos"))
    val byFeat = Window.partitionBy("feature").orderBy("bin")
    val cum = stats
      .withColumn("nl", sum("n").over(byFeat))
      .withColumn("posl", sum("pos").over(byFeat))
      .withColumn("ntot", sum("n").over(Window.partitionBy("feature")))
      .withColumn("postot", sum("pos").over(Window.partitionBy("feature")))
    val widths = features.map(f => f.name -> ((f.hi - f.lo) / f.bins, f.lo)).toMap
    val thrExpr = features.tail.foldLeft(
      lit(widths(features.head.name)._2) +
        (col("bin") + 1).cast("double") * lit(widths(features.head.name)._1)) {
      case (acc, f) => when(col("feature") === f.name,
        lit(widths(f.name)._2) + (col("bin") + 1).cast("double") *
          lit(widths(f.name)._1)).otherwise(acc)
    }
    val nr = col("ntot") - col("nl")
    val posr = col("postot") - col("posl")
    val gain = gini(col("postot"), col("ntot")) -
      (col("nl").cast("double") / col("ntot") * gini(col("posl"), col("nl")) +
        nr.cast("double") / col("ntot") * gini(posr, nr))
    cum.filter(col("nl") > 0 && nr > 0)
      .select(col("feature"), round(thrExpr, 6).as("threshold"),
        col("nl").as("w_left"), nr.as("w_right"),
        round(gain, 6).as("gain"),
        // majority label per side, ties → 0 (2·pos > n means majority 1)
        when(col("posl") * 2 > col("nl"), 1L).otherwise(0L).as("maj_l"),
        when(posr * 2 > nr, 1L).otherwise(0L).as("maj_r"))
      .orderBy(col("gain").desc, col("feature"), col("threshold"))
      .limit(1)
  }

  /** Evaluate every "feature ≤ threshold" stump over a 0/1 `labelCol`
    * and return the `topK` splits by Gini gain. Output: (feature,
    * threshold, n_left, n_right, gain) with gain rounded to 6 decimals;
    * ordered by (gain desc, feature asc, threshold asc) so rounded-gain
    * ties stay deterministic. Degenerate splits (an empty side) are
    * excluded. */
  def bestSplits(df: DataFrame, labelCol: String, features: Seq[Feature],
                 topK: Int = 3): DataFrame = {
    require(features.nonEmpty, "bestSplits: need at least one feature")
    features.foreach(f => require(f.bins >= 2 && f.hi > f.lo,
      s"feature ${f.name}: need bins >= 2 and hi > lo"))
    // one scan: every feature's bin id + the label, unioned by feature.
    // A single pass per feature is still one corpus scan each — fold all
    // features into ONE select of (feature, bin) structs and explode, so
    // the corpus is scanned once no matter how many features.
    val binStructs = array(features.map { f =>
      val w = (f.hi - f.lo) / f.bins
      val raw = floor((f.value.cast("double") - lit(f.lo)) / lit(w))
      val bin = least(greatest(raw, lit(0.0)), lit((f.bins - 1).toDouble))
        .cast("long")
      struct(lit(f.name).as("feature"), bin.as("bin"))
    }: _*)
    val stats = df
      .select(explode(binStructs).as("fb"), col(labelCol).cast("long").as("_y"))
      .groupBy(col("fb.feature").as("feature"), col("fb.bin").as("bin"))
      .agg(count(lit(1)).as("n"), sum("_y").as("pos"))
    // everything below runs over features·bins rows
    val byFeat = Window.partitionBy("feature").orderBy("bin")
    val cum = stats
      .withColumn("nl", sum("n").over(byFeat))
      .withColumn("posl", sum("pos").over(byFeat))
      .withColumn("ntot", sum("n").over(Window.partitionBy("feature")))
      .withColumn("postot", sum("pos").over(Window.partitionBy("feature")))
    val widths = features.map(f => f.name -> ((f.hi - f.lo) / f.bins, f.lo)).toMap
    val thrExpr = features.tail.foldLeft(
      lit(widths(features.head.name)._2) +
        (col("bin") + 1).cast("double") * lit(widths(features.head.name)._1)) {
      case (acc, f) => when(col("feature") === f.name,
        lit(widths(f.name)._2) + (col("bin") + 1).cast("double") *
          lit(widths(f.name)._1)).otherwise(acc)
    }
    val nr = col("ntot") - col("nl")
    val posr = col("postot") - col("posl")
    val gain = gini(col("postot"), col("ntot")) -
      (col("nl").cast("double") / col("ntot") * gini(col("posl"), col("nl")) +
        nr.cast("double") / col("ntot") * gini(posr, nr))
    cum.filter(col("nl") > 0 && nr > 0)
      .select(col("feature"), round(thrExpr, 6).as("threshold"),
        col("nl").as("n_left"), nr.as("n_right"),
        round(gain, 6).as("gain"))
      .orderBy(col("gain").desc, col("feature"), col("threshold"))
      .limit(topK)
  }
}

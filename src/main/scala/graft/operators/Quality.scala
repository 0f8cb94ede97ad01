package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality assertion report — the validate-before-ingest step a
  * production pipeline runs ahead of publishing a drop (the reference
  * does this procedurally with ad-hoc `count()` checks interleaved
  * through its ETL scripts, e.g. `spark_jobs/etl_yellow_s3.py`'s
  * four-count re-runs; public tooling shape: Deequ / dbt tests).
  *
  * Scale shape: every predicate rule folds into ONE aggregation pass
  * over the frame (conditional counts — map-side partial, no shuffle of
  * row data, no per-rule job). Exact uniqueness rules need key
  * cardinality, so each adds a `countDistinct` to the same pass — that
  * shuffles every distinct key tuple, and two or more uniqueness rules
  * trigger the multi-distinct Expand rewrite; [[UniqueApprox]] is the
  * contract-gated scale twin (HLL sketches: constant reducer state, no
  * distinct shuffle, no Expand). The output is one row per rule —
  * constant-size regardless of input volume.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** Violation when `col` is null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Violation when non-null `col` falls outside [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    // an inverted or NaN bound would silently flag EVERY non-null row —
    // a typo'd rule must fail at construction, not read as bad data
    require(!lo.isNaN && !hi.isNaN, s"in_range($col): NaN bound")
    require(lo <= hi, s"in_range($col): empty range [$lo, $hi] (lo > hi)")
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Violation when non-null `col` is not one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    // an empty set rejects every non-null row — certainly a bug upstream
    require(values.nonEmpty, s"in_set($col): empty value set")
    def name = s"in_set($col)"
  }
  /** Violation when a non-null predicate evaluates false (nulls pass —
    * pair with [[NotNull]] to reject them). */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies($label)"
  }
  /** Violations = rows beyond the first per key tuple (0 when the key
    * tuple is unique across the frame). */
  final case class Unique(cols: Seq[String]) extends Rule {
    require(cols.nonEmpty, "unique(): at least one key column required")
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Scale twin of [[Unique]]: the exact rule's `countDistinct` shuffles
    * every distinct key tuple — 84 MB of the 16M-row quality probe's
    * shuffle in SCALE.md, growing with key cardinality — and multiple
    * exact rules additionally Expand. This estimates the distinct count
    * with HLL instead (constant sketch state), so the verdict is
    * contract-gated: the rule PASSES when the estimated violation count
    * is within the sketch's noise of zero (`n − est ≤ 3·rsd·n`). A
    * duplication rate above 3·rsd can therefore never pass; one below it
    * is indistinguishable from sketch noise — the documented trade,
    * exactly `pr2`/`t12`'s. */
  final case class UniqueApprox(cols: Seq[String], rsd: Double = 0.05) extends Rule {
    require(cols.nonEmpty, "unique_approx(): at least one key column required")
    require(rsd > 0.0 && rsd < 1.0, s"unique_approx(): rsd must be in (0,1), got $rsd")
    def name = s"unique_approx(${cols.mkString(",")})"
  }

  private def violations(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case InRange(c, lo, hi) =>
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1))
    case InSet(c, vs) =>
      count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1))
    case Satisfies(_, p) => count(when(!coalesce(p, lit(true)), 1))
    case Unique(cs) =>
      // rows minus distinct key tuples; nulls participate as a value
      // (two all-null keys are duplicates, matching SQL GROUP BY)
      count(lit(1)) - countDistinct(struct(cs.map(col): _*))
    case UniqueApprox(cs, rsd) =>
      // the HLL estimate can exceed the row count on unique data —
      // clamp so the "violation count" stays a count
      greatest(lit(0L), count(lit(1)) -
        approx_count_distinct(struct(cs.map(col): _*), rsd))
  }

  /** Pass verdict per rule: exact rules demand zero violations; the
    * sketch-backed rule passes within its error contract. */
  private def passes(r: Rule, v: Column, nRows: Column): Column = r match {
    case UniqueApprox(_, rsd) => v <= ceil(nRows * lit(3.0 * rsd))
    case _ => v === 0L
  }

  /** One row per rule: (rule, n_rows, n_violations, pass). A frame with
    * zero rows passes every rule (nothing violated — gate emptiness
    * separately with a `Satisfies`/count check if emptiness is an
    * error). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val names = rules.map(_.name)
    require(names.distinct.length == names.length,
      s"duplicate rule names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) => violations(r).as(s"_v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // constant-size pivot: one row in, |rules| rows out via stack()
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_v$i").as("n_violations"),
        passes(r, col(s"_v$i"), col("n_rows")).as("pass"))
    }
    one.select(col("n_rows"), explode(array(stacked: _*)).as("s"))
      .select(col("s.rule").as("rule"), col("n_rows"),
        col("s.n_violations").as("n_violations"), col("s.pass").as("pass"))
      .orderBy("rule")
  }

  /** Functional-dependency audit: for each candidate FD lhs → rhs,
    * report how many lhs keys exist, how many map to MORE than one
    * distinct rhs (violations), and the worst fan-out. Per FD this is a
    * keys-only aggregation — `(lhs, rhs)` distinct pairs, then a
    * per-key distinct count — so the payload never shuffles and the
    * reduce side is bounded by key cardinality, not row count. The
    * discovery primitive behind "is this column a reliable join key /
    * dimension attribute?" */
  def fdViolations(df: DataFrame, fds: Seq[(String, String, String)]): DataFrame = {
    require(fds.nonEmpty, "at least one candidate FD required")
    fds.map { case (label, lhs, rhs) =>
      df.select(col(lhs).as("k"), col(rhs).as("v"))
        .distinct()
        .groupBy("k")
        .agg(count(lit(1)).as("d"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("d") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("d").as("max_fanout"))
        .select(lit(label).as("fd"), col("n_keys"), col("n_violating"),
          col("max_fanout"), (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionByName(_)).orderBy("fd")
  }

  /** Row-level PASS predicate for a row-local rule. [[Unique]] /
    * [[UniqueApprox]] are aggregate-level (a row is only a "duplicate"
    * relative to the whole frame) and fail fast here — routing
    * duplicates is [[graft.dedup.Dedup]]'s job. */
  def rowPredicate(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNotNull
    case InRange(c, lo, hi) => col(c).isNull || (col(c) >= lo && col(c) <= hi)
    case InSet(c, vs) => col(c).isNull || col(c).isin(vs: _*)
    case Satisfies(_, p) => coalesce(p, lit(true))
    case other => throw new IllegalArgumentException(
      s"rowPredicate: ${other.name} is not a row-local rule")
  }

  /** Tag each row with the (possibly empty) array of row-local rules it
    * violates — `_failed_rules`, in rule order. Row-local codegen'd
    * when-chain; no shuffle, composes with any scan. */
  def withFailedRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val tags = rules.map(r =>
      when(!rowPredicate(r), lit(r.name)).otherwise(lit(null)))
    df.withColumn("_failed_rules",
      filter(array(tags: _*), t => t.isNotNull))
  }

  /** Validate-and-route (the production shape of validate-before-ingest):
    * rows passing every row-local rule land in `goodPath`; violators
    * land in `badPath` WITH a `_failed_rules` column naming why — the
    * quarantine a pipeline replays after an upstream fix instead of
    * re-ingesting the world. ONE pass tags rows; each sink writes its
    * filtered slice in parallel (no coalesce funnel — at 100 TB the
    * writer count is the ingest bandwidth; the two filtered writes each
    * prune the other slice at the scan). Returns (nGood, nBad) read
    * from the written files — the counts a drop manifest records. */
  def quarantine(df: DataFrame, rules: Seq[Rule],
                 goodPath: String, badPath: String): (Long, Long) = {
    val spark = df.sparkSession
    val tagged = withFailedRules(df, rules)
      // tag once, route twice: without this the full rule chain (and
      // everything upstream) re-executes per sink
      .persist()
    try {
      tagged.filter(size(col("_failed_rules")) === 0).drop("_failed_rules")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(goodPath)
      tagged.filter(size(col("_failed_rules")) > 0)
        .withColumn("_failed_rules",
          concat_ws(",", col("_failed_rules")))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(badPath)
      (spark.read.parquet(goodPath).count(),
        spark.read.parquet(badPath).count())
    } finally { tagged.unpersist(); () }
  }

  /** Approximate functional-dependency MINING (TANE's g₃-style
    * confidence, Kivinen–Mannila error measure) over every ordered pair
    * of the given columns: confidence(X→Y) = Σ_x max_y n(x,y) / N — the
    * share of rows kept by the best per-determinant-value mapping.
    * 1.0 = exact FD; [[fdViolations]] is the checker for DECLARED FDs,
    * this is the discoverer that proposes them.
    *
    * Scale shape: the frame is melted once to (key, column, value) —
    * k× fan-out, row-local — and pairs come from ONE self-join
    * co-partitioned on the row key (k² pairs per row, k a handful by
    * construction), feeding a partial→final count aggregation whose
    * result is bounded by Σ pairwise distinct-value products. The
    * alternative k² separate corpus scans is what this shape avoids;
    * all reductions after the pair count run on value-cardinality
    * tables. Values are stringified for the melt — injective, so
    * counts and confidences are representation-independent. */
  def approxFds(df: DataFrame, keyCol: String, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    val n = df.agg(count(lit(1)).as("_n"))
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val melted = df.selectExpr(s"`$keyCol` AS _id",
      s"stack(${cols.size}, $stackArgs) AS (_c, _v)")
    val a = melted.select(col("_id"), col("_c").as("det"), col("_v").as("_dv"))
    val b = melted.select(col("_id"), col("_c").as("dep"), col("_v").as("_pv"))
    a.join(b, Seq("_id")).filter(col("det") =!= col("dep"))
      .groupBy("det", "dep", "_dv", "_pv").agg(count(lit(1)).as("_cnt"))
      .groupBy("det", "dep", "_dv").agg(max("_cnt").as("_mx"))
      .groupBy("det", "dep")
      .agg(count(lit(1)).as("n_det_values"), sum("_mx").as("_kept"))
      .crossJoin(broadcast(n))
      .select(col("det"), col("dep"), col("n_det_values"),
        round(col("_kept").cast("double") / col("_n"), 6).as("confidence"))
      .orderBy("det", "dep")
  }
}

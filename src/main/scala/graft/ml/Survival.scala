package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier, "Nonparametric
  * Estimation from Incomplete Observations", JASA 1958) over event
  * streams — the churn/retention statistic the reference's cohort
  * notebooks stop short of: S(t) = Π_{s≤t} (1 − d_s/n_s) with
  * right-censoring for subjects still active at the observation
  * horizon.
  *
  * Scale shape: one partial→final aggregate collapses the corpus to a
  * per-subject (first, last) pair, a second collapses subjects to
  * per-duration (events, censored) counts. Every ordered window after
  * that runs over the DURATION-level table, whose row count is bounded
  * by the observation span in days (≤ a few thousand for decades of
  * data) — metadata-sized, never subject- or corpus-sized. The global
  * horizon is a scalar aggregate broadcast back.
  */
object Survival {

  /** Per-duration KM curve. Subject lifetime = days between first and
    * last event; a subject is an observed churn event when its last
    * activity precedes the global horizon (max last-day) by at least
    * `censorHorizonDays`, otherwise right-censored. Rows are emitted
    * only at durations with ≥1 event (the survival curve's step
    * points), but the risk sets count censored subjects too — the
    * textbook estimator. */
  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String,
                  censorHorizonDays: Int = 7): DataFrame = {
    val upTo = Window.orderBy("dur")
    durationRisk(df, userCol, tsCol, censorHorizonDays)
      .filter(col("d") > 0)
      // the log-sum runs over event-duration rows only (factor 1 rows
      // dropped above contribute nothing); the d == n_risk guard keeps
      // ln(0) out of the window — that row's survival is exactly 0
      .withColumn("survival",
        when(col("d") >= col("n_risk"), 0.0).otherwise(
          exp(sum(log(when(col("d") < col("n_risk"),
            lit(1.0) - col("d").cast("double") / col("n_risk"))
            .otherwise(lit(1.0)))).over(upTo))))
      .select(col("dur").cast("int").as("duration_days"),
        col("n_risk"), col("d").as("n_events"),
        round(col("survival"), 4).as("survival"))
      .orderBy("duration_days")
  }

  /** Nelson–Aalen cumulative hazard over the same lifetime/censoring
    * model as [[kaplanMeier]]: `H(t) = Σ_{s≤t} d_s/n_s` at each event
    * duration, plus the Breslow survival estimate `exp(−H)`. The
    * hazard increments are a running sum over the duration-level
    * table (same metadata-sized window as KM's log-product). */
  def nelsonAalen(df: DataFrame, userCol: String, tsCol: String,
                  censorHorizonDays: Int = 7): DataFrame = {
    val upTo = Window.orderBy("dur")
    durationRisk(df, userCol, tsCol, censorHorizonDays)
      .filter(col("d") > 0)
      .withColumn("cum_hazard",
        sum(col("d").cast("double") / col("n_risk")).over(upTo))
      .select(col("dur").cast("int").as("duration_days"),
        col("n_risk"), col("d").as("n_events"),
        round(col("cum_hazard"), 6).as("cum_hazard"),
        round(exp(-col("cum_hazard")), 6).as("surv_breslow"))
      .orderBy("duration_days")
  }

  /** Shared lifetime → duration-level risk table: per lifetime
    * duration, observed-event count `d`, censored count `c`, and the
    * at-risk set size `n_risk` (subjects with duration ≥ this one).
    * One subject aggregate, one duration aggregate; the risk window
    * runs over the ≤span-days duration table. */
  private def durationRisk(df: DataFrame, userCol: String, tsCol: String,
                           censorHorizonDays: Int): DataFrame = {
    val subjects = df
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_day"))
      .groupBy("_u")
      .agg(min("_day").as("_f"), max("_day").as("_l"))
    val horizon = subjects.agg(max("_l").as("_mx"),
      count(lit(1)).as("_n_total"))
    val lifetimes = subjects.crossJoin(broadcast(horizon))
      .select(datediff(col("_l"), col("_f")).as("dur"),
        when(datediff(col("_mx"), col("_l")) >= censorHorizonDays, 1L)
          .otherwise(0L).as("_ev"),
        col("_n_total"))
    // duration-level table: ≤ observation-span rows from here on
    val byDur = lifetimes.groupBy("dur", "_n_total")
      .agg(sum("_ev").as("d"), (count(lit(1)) - sum("_ev")).as("c"))
    val before = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    byDur
      .withColumn("n_risk",
        col("_n_total") - coalesce(sum(col("d") + col("c")).over(before), lit(0L)))
      .drop("_n_total")
  }
}

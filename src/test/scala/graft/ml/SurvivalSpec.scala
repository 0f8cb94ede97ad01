package graft.ml

import graft.SparkTestBase

import java.sql.Timestamp

class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int) =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  /** (user, activeDays) → one event per active day. */
  private def stream(users: (Long, Seq[Int])*) =
    users.flatMap { case (u, days) => days.map(d => (u, ts(d))) }
      .toDF("user_id", "ts")

  test("textbook product-limit curve with censoring") {
    // durations: u1→1 (event), u2→3 (event), u3→10 (event),
    // u4→15 but last-active on the horizon day → censored
    val df = stream(1L -> Seq(0, 1), 2L -> Seq(0, 3), 3L -> Seq(0, 10),
      4L -> Seq(5, 20))
    val r = Survival.kaplanMeier(df, "user_id", "ts").collect()
    assert(r.map(_.getAs[Int]("duration_days")).toSeq == Seq(1, 3, 10))
    assert(r.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L))
    assert(r.map(_.getAs[Long]("n_events")).toSeq == Seq(1L, 1L, 1L))
    // S = 3/4, then 3/4·2/3 = 1/2, then 1/2·1/2 = 1/4
    assert(r.map(_.getAs[Double]("survival")).toSeq == Seq(0.75, 0.5, 0.25))
  }

  test("exhausted risk set pins survival to exactly zero (ln(0) guard)") {
    val df = stream(1L -> Seq(0, 5), 2L -> Seq(0), 3L -> Seq(20))
    val r = Survival.kaplanMeier(df, "user_id", "ts").collect()
    // dur 0: one event (u2), one censored (u3, the horizon holder) of 3;
    // dur 5: u1 is the last subject at risk and churns → survival 0
    assert(r.map(_.getAs[Double]("survival")).toSeq == Seq(0.6667, 0.0))
    assert(r.map(_.getAs[Long]("n_risk")).toSeq == Seq(3L, 1L))
  }

  test("nelsonAalen accumulates d/n at each event duration, KM risk sets shared") {
    // same fixture as the textbook KM case: events at durations 1, 3,
    // 10 with risk sets 4, 3, 2 -> H = 1/4, 1/4+1/3, +1/2
    val df = stream(1L -> Seq(0, 1), 2L -> Seq(0, 3), 3L -> Seq(0, 10),
      4L -> Seq(5, 20))
    val r = Survival.nelsonAalen(df, "user_id", "ts").collect()
    assert(r.map(_.getAs[Int]("duration_days")).toSeq == Seq(1, 3, 10))
    assert(r.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L))
    assert(r.map(_.getAs[Double]("cum_hazard")).toSeq
      == Seq(0.25, 0.583333, 1.083333))
    assert(r.map(_.getAs[Double]("surv_breslow")).toSeq
      == Seq(0.778801, 0.558035, 0.338465))
  }

  test("deterministic across partitionings") {
    val df = stream((1L to 40L).map(u =>
      u -> Seq(0, (u % 13).toInt, (u % 23).toInt)): _*)
    val a = Survival.kaplanMeier(df, "user_id", "ts").collect().toSeq
    val b = Survival.kaplanMeier(df.repartition(17), "user_id", "ts")
      .collect().toSeq
    assert(Survival.nelsonAalen(df, "user_id", "ts").collect().toSeq
      == Survival.nelsonAalen(df.repartition(17), "user_id", "ts")
        .collect().toSeq)
    assert(a == b)
  }
}

package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dirty-row cases from FIXTURES §A.6 — semantics pinned to the
  * reference's v2 ETL (`spark_jobs/etl_yellow_s3_v2.py:32-61`). */
class CleaningSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trip(pickup: String, dropoff: String, dist: java.lang.Double,
                   fare: java.lang.Double): Row =
    Row("test",
      if (pickup == null) null else ts(pickup),
      if (dropoff == null) null else ts(dropoff),
      1, 1, dist, fare, 0.0, if (fare == null) null else fare)

  private def trips(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), TaxiSchemas.canonical)

  private val good = trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 6.0, 20.0)

  test("good trip survives; derived speed is exact") {
    val out = Cleaning.withRatios(Cleaning.clean(trips(good)))
    assert(out.count() == 1)
    val r = out.collect().head
    assert(r.getAs[Double]("duration_min") == 30.0)
    // 6 miles in 30 min = 12 mph (SURVEY §5 test case)
    assert(r.getAs[Double]("avg_speed_mph") == 12.0)
    assert(math.abs(r.getAs[Double]("fare_per_mile") - 20.0 / 6.0) < 1e-12)
  }

  test("null timestamps dropped") {
    assert(Cleaning.clean(trips(trip(null, "2024-01-01 10:30:00", 1.0, 5.0))).count() == 0)
    assert(Cleaning.clean(trips(trip("2024-01-01 10:00:00", null, 1.0, 5.0))).count() == 0)
  }

  test("dropoff <= pickup dropped") {
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:30:00", "2024-01-01 10:00:00", 1.0, 5.0),
      trip("2024-01-01 10:00:00", "2024-01-01 10:00:00", 1.0, 5.0))).count() == 0)
  }

  test("duration bounds (0.5, 1440) exclusive") {
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:00:20", 1.0, 5.0),    // 0.33 min
      trip("2024-01-01 10:00:00", "2024-01-02 10:00:00", 1.0, 5.0))).count() == 0) // 1440
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:00:31", 1.0, 5.0))).count() == 1)
  }

  test("distance bounds (0, 500) exclusive; null distance kept (fhv)") {
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 0.0, 5.0),
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 500.0, 5.0))).count() == 0)
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", null, null))).count() == 1)
  }

  test("fare >= 0 kept (v2 semantics), negative dropped") {
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 1.0, 0.0))).count() == 1)
    assert(Cleaning.clean(trips(
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 1.0, -1.0))).count() == 0)
  }

  test("cleaning is idempotent and monotone (cleaned ⊆ raw)") {
    val raw = trips(good,
      trip(null, "2024-01-01 10:30:00", 1.0, 5.0),
      trip("2024-01-01 10:00:00", "2024-01-01 10:30:00", 1.0, -1.0))
    val once = Cleaning.clean(raw)
    val twice = Cleaning.clean(once.drop("duration_min"))
    assert(once.count() == twice.count())
    assert(once.count() <= raw.count())
  }

  test("safeDouble: regex-guarded cast yields NULL on junk") {
    import spark.implicits._
    val vals = Seq("1.5", "-2", "abc", "1.2.3", "").toDF("s")
      .select(Cleaning.safeDouble(col("s")).as("d")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.toSeq == Seq(Some(1.5), Some(-2.0), None, None, None))
  }

  test("zero distance yields NULL fare_per_mile, not infinity") {
    import spark.implicits._
    val r = Seq((0.0, 10.0)).toDF("d", "f")
      .select(Cleaning.farePerMile(col("f"), col("d")).as("fpm")).collect().head
    assert(r.isNullAt(0))
  }

  test("season mapping matches reference buckets") {
    import spark.implicits._
    val out = (1 to 12).toDF("m").select(Cleaning.season(col("m")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Winter", "Winter", "Spring", "Spring", "Spring",
      "Summer", "Summer", "Summer", "Fall", "Fall", "Fall", "Winter"))
  }
}

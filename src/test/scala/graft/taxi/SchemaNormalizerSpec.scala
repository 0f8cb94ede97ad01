package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The four divergent cab-type schemas (FIXTURES §A) must all project to
  * the canonical trip schema, surviving the reference's traps: FHV's
  * `PUlocationID`/`dropOff_datetime` casing, FHVHV's `trip_miles`/`tips`
  * naming, and missing-fare reconstruction from components. */
class SchemaNormalizerSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("detect: case-insensitive exact match wins over substring") {
    val fields = Seq("tpep_pickup_datetime", "pickup_datetime_str")
    assert(SchemaNormalizer.detect(fields, Seq("pickup_datetime"))
      .contains("pickup_datetime_str") === false)
  }

  test("yellow projects to canonical with all fields") {
    val y = df(TaxiSchemas.yellow,
      Row("1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"),
        1, 6.0, "1", "N", 132, 138, "1",
        20.0, 1.0, 0.5, 4.0, 0.0, 0.3, 25.8, 2.5, 0.0))
    val c = SchemaNormalizer.toCanonical(y, "yellow").collect().head
    assert(c.getAs[String]("cab_type") == "yellow")
    assert(c.getAs[Int]("pu_zone") == 132)
    assert(c.getAs[Double]("distance_mi") == 6.0)
    assert(c.getAs[Double]("fare") == 20.0)
    assert(c.getAs[Double]("tip") == 4.0)
    assert(c.getAs[Double]("total") == 25.8)
  }

  test("fhv survives PUlocationID / dropOff_datetime casing traps") {
    val f = df(TaxiSchemas.fhv,
      Row("B001", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:20:00"),
        264.0, 265.0, null, "B001"))
    val c = SchemaNormalizer.toCanonical(f, "fhv").collect().head
    assert(c.getAs[Timestamp]("dropoff_ts") == ts("2024-01-01 09:20:00"))
    assert(c.getAs[Int]("pu_zone") == 264)
    assert(c.getAs[Int]("do_zone") == 265)
    // FHV has no fare/distance columns → typed nulls, not a crash
    assert(c.isNullAt(c.fieldIndex("fare")))
    assert(c.isNullAt(c.fieldIndex("distance_mi")))
  }

  test("fhvhv maps trip_miles/tips and reconstructs total from components") {
    val h = df(TaxiSchemas.fhvhv,
      Row("HV0003", "B002", "B002",
        ts("2024-01-01 07:55:00"), ts("2024-01-01 07:58:00"),
        ts("2024-01-01 08:00:00"), ts("2024-01-01 08:30:00"),
        132, 265, 10.5, 1800L,
        30.0, 5.0, 0.75, 2.5, 2.75, 1.25, 6.0, 25.0,
        "N", "N", "N", "N", "Y"))
    val c = SchemaNormalizer.toCanonical(h, "fhvhv").collect().head
    assert(c.getAs[Double]("distance_mi") == 10.5)
    assert(c.getAs[Double]("fare") == 30.0)
    assert(c.getAs[Double]("tip") == 6.0)
    // no total_amount column → sum of fare components, null→0
    assert(math.abs(c.getAs[Double]("total") - (30.0 + 5.0 + 0.75 + 2.5 + 2.75 + 1.25 + 6.0)) < 1e-9)
  }

  test("unionCanonical merges all four cab types into one frame") {
    val frames = Seq(
      SchemaNormalizer.toCanonical(df(TaxiSchemas.yellow,
        Row("1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"),
          1, 6.0, "1", "N", 132, 138, "1",
          20.0, 1.0, 0.5, 4.0, 0.0, 0.3, 25.8, 2.5, 0.0)), "yellow"),
      SchemaNormalizer.toCanonical(df(TaxiSchemas.fhv,
        Row("B001", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:20:00"),
          264.0, 265.0, null, "B001")), "fhv"))
    val u = SchemaNormalizer.unionCanonical(frames)
    assert(u.count() == 2)
    assert(u.select("cab_type").distinct().count() == 2)
    assert(u.schema.fieldNames.toSeq == TaxiSchemas.canonical.fieldNames.toSeq)
  }
}

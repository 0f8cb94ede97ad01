package graft.taxi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic raw-schema taxi frames synthesized from the `events`
  * gate table — pure integer arithmetic over (event_id, user_id, ts), so
  * a SQL oracle can regenerate the identical rows and pin the whole
  * raw → canonical → clean → analytics path (SchemaNormalizer detection,
  * the FHV `PUlocationID`/`dropOff_datetime` traps, FHVHV fare
  * reconstruction, and every cleaning constant in [[Cleaning]]).
  *
  * The value ranges deliberately straddle each cleaning bound
  * (`utils.py:54-72` semantics): durations 0..1499 min (0 fails the
  * dropoff>pickup sanity, 1440+ fails the <1440 cap), distances
  * -10..609 (≤0 and ≥500 dropped), fares -10..199 (negatives dropped),
  * with periodic NULLs (kept by the engine's null-tolerant clean — the
  * generalization that lets FHV rows, which have no fare/distance at
  * all, survive the shared pipeline).
  */
object TaxiFixture {

  private def durMin: Column = (col("event_id") % 1500).cast("int")
  private def dropoffTs: Column =
    col("ts") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), durMin, lit(0))
  private def distance: Column =
    when(col("event_id") % 97 === 0, lit(null))
      .otherwise((col("event_id") * 7 % 620 - 10).cast("double"))
  private def fareAmt: Column =
    when(col("event_id") % 89 === 0, lit(null))
      .otherwise((col("event_id") * 13 % 210 - 10).cast("double"))
  private def puZone: Column = (col("user_id") % 260 + 1).cast("int")
  private def doZone: Column = ((col("user_id") + col("event_id")) % 260 + 1).cast("int")

  /** Yellow-schema raw frame (`spark_jobs/utils.py:9-27` column names). */
  def yellowFromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("V"), (col("event_id") % 3).cast("string")).as("VendorID"),
      col("ts").as("tpep_pickup_datetime"),
      dropoffTs.as("tpep_dropoff_datetime"),
      (col("event_id") % 5 + 1).cast("int").as("passenger_count"),
      distance.as("trip_distance"),
      puZone.as("PULocationID"),
      doZone.as("DOLocationID"),
      fareAmt.as("fare_amount"),
      col("value").as("tip_amount"),
      (coalesce(fareAmt, lit(0.0)) + col("value")).as("total_amount"))

  /** FHV-schema raw frame — exercises the `PUlocationID` (lowercase l)
    * and `dropOff_datetime` (camel O) detection traps; no fare or
    * distance columns exist, matching the real FHV files. */
  def fhvFromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("B"), (col("user_id") % 10).cast("string")).as("dispatching_base_num"),
      col("ts").as("pickup_datetime"),
      dropoffTs.as("dropOff_datetime"),
      puZone.cast("double").as("PUlocationID"),
      doZone.cast("double").as("DOlocationID"),
      (col("event_id") % 2).cast("int").as("SR_Flag"))

  /** FHVHV-schema raw frame — no `total_amount`, so the canonical total
    * must come from fare-component reconstruction (null→0 per row). */
  def fhvhvFromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("HV000"), (col("event_id") % 4).cast("string")).as("hvfhs_license_num"),
      col("ts").as("pickup_datetime"),
      dropoffTs.as("dropoff_datetime"),
      puZone.as("PULocationID"),
      doZone.as("DOLocationID"),
      distance.as("trip_miles"),
      (durMin.cast("long") * 60L).as("trip_time"),
      fareAmt.as("base_passenger_fare"),
      (col("event_id") % 7).cast("double").as("tolls"),
      (col("event_id") % 3).cast("double").as("bcf"),
      (col("event_id") % 9).cast("double").as("sales_tax"),
      (col("event_id") % 11).cast("double").as("congestion_surcharge"),
      when(col("event_id") % 13 === 0, lit(null))
        .otherwise((col("event_id") % 5).cast("double")).as("airport_fee"),
      (col("event_id") % 23).cast("double").as("tips"))
}

package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.CuratedWriter

/** The reference's aggregate entry point (SURVEY §3.2,
  * `spark_jobs/analytics_yellow_s3.py`): read the curated tree, filter a
  * year range, and produce the four headline aggregates. Unlike the
  * reference — which re-scanned the base data for each of the four
  * queries — the cleaned frame is cached once before the fan-out.
  *
  * Usage: AnalyticsJob --input <curated base> --output <out base>
  *                     [--from-year Y --to-year Y]
  */
object AnalyticsJob {

  /** Q1 `avg_fare_per_mile_by_hour` (`analytics_yellow_s3.py:15-19`). */
  def hourlyFare(trips: DataFrame): DataFrame =
    trips
      .groupBy("pickup_hour")
      .agg(avg("fare_per_mile").as("avg_fare_per_mile"),
        count(lit(1)).as("trip_count"))
      .orderBy("pickup_hour")

  /** Q2 `trips_by_dow` (`analytics_yellow_s3.py:21-23`). */
  def tripsByDow(trips: DataFrame): DataFrame =
    trips.groupBy("pickup_dow").agg(count(lit(1)).as("trip_count"))
      .orderBy("pickup_dow")

  /** Q3/Q4 busiest pickup/dropoff zones (`analytics_yellow_s3.py:25-28`). */
  def busiestZones(trips: DataFrame, zoneCol: String): DataFrame =
    trips.groupBy(zoneCol).agg(count(lit(1)).as("trip_count"))
      .orderBy(desc("trip_count"), asc(zoneCol)).limit(100)

  def run(spark: SparkSession, input: String, output: String,
          fromYear: Int, toYear: Int): Unit = {
    val trips = CuratedWriter.readCurated(spark, input)
      .filter(col("pickup_year").between(fromYear, toYear))
      .cache()
    try {
      CuratedWriter.writeSummary(hourlyFare(trips), s"$output/avg_fare_per_mile_by_hour")
      CuratedWriter.writeSummary(tripsByDow(trips), s"$output/trips_by_dow")
      CuratedWriter.writeSummary(busiestZones(trips, "pu_zone"), s"$output/busiest_pickup")
      CuratedWriter.writeSummary(busiestZones(trips, "do_zone"), s"$output/busiest_dropoff")
    } finally trips.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val a = EtlJob.parseArgs(args)
    val spark = GraftSession.submitted("graft-analytics")
    try run(spark, a("input"), a("output"),
      a.getOrElse("from-year", "1900").toInt, a.getOrElse("to-year", "2999").toInt)
    finally spark.stop()
  }
}

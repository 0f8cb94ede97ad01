package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives for point data (the reference's pickup/dropoff
  * zone analytics generalize to raw coordinates once data carries
  * lat/lon): great-circle distance and nearest-reference-point
  * assignment.
  *
  * Scale shape: the reference set (stations, zone centroids, POIs) is
  * dimension-sized, so assignment is a BROADCAST cross join + per-point
  * argmin — points never shuffle, work is points × |refs| row-local
  * arithmetic, all inside whole-stage codegen. For reference sets too
  * big to broadcast, the standard escalation is geohash/grid bucketing
  * (join points to refs sharing a cell ± neighbors — the same
  * band-bucket pattern as [[graft.operators.RangeJoin]]); this module
  * implements the broadcast tier, which covers every catalog that fits
  * in tens of MB. */
object Geo {

  /** Great-circle (haversine) distance in km between two (lat, lon)
    * pairs given in degrees. Pure row-local arithmetic — codegen'd
    * builtins only, no UDF. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** Assign each point to its nearest station and roll up per station:
    * (station_id, n_points, avg_km, max_km). `points` needs
    * (point_id, lat, lon); `stations` needs (station_id, s_lat, s_lon)
    * and must be broadcast-sized. The argmin is `min(struct(dist,
    * station_id))` — lexicographic, so equidistant stations resolve to
    * the smallest id deterministically. */
  def nearestStationProfile(points: DataFrame, stations: DataFrame): DataFrame =
    points
      .crossJoin(broadcast(stations))
      .withColumn("_d", haversineKm(col("lat"), col("lon"),
        col("s_lat"), col("s_lon")))
      .groupBy("point_id")
      .agg(min(struct(col("_d"), col("station_id"))).as("_best"))
      .select(col("_best.station_id").as("station_id"),
        col("_best._d").as("_d"))
      .groupBy("station_id")
      .agg(count(lit(1)).as("n_points"),
        round(avg("_d"), 2).as("avg_km"),
        round(max("_d"), 2).as("max_km"))
      .orderBy("station_id")
}

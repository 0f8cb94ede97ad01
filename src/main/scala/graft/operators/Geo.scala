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
    profile(points
      .crossJoin(broadcast(stations))
      .withColumn("_d", haversineKm(col("lat"), col("lon"),
        col("s_lat"), col("s_lon")))
      .groupBy("point_id")
      .agg(min(struct(col("_d"), col("station_id"))).as("_best"))
      .select(col("_best.station_id").as("station_id"),
        col("_best._d").as("_d")))

  private def profile(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("station_id")
      .agg(count(lit(1)).as("n_points"),
        round(avg("_d"), 2).as("avg_km"),
        round(max("_d"), 2).as("max_km"))
      .orderBy("station_id")

  /** km per degree of latitude (R·π/180) — also the great-circle LOWER
    * bound per degree of latitude difference: for fixed longitudes the
    * haversine distance is exactly this × Δlat, and any longitude
    * difference only increases it. */
  private val kmPerDegLat = math.Pi / 180.0 * 6371.0

  /** The non-broadcastable-catalog escalation of
    * [[nearestStationProfile]]: latitude-band bucketing with doubling
    * ring escalation, EXACT by the latitude bound above. Stations hash
    * into `bandDeg`-degree latitude bands; round `r` joins the still-
    * unresolved points against all stations within ±r bands (an
    * ordinary equi-join on the band key — no cross join anywhere) and
    * accepts a point's argmin as global once it is ≤ r·bandDeg·111.19 km
    * (scaled by (1−1e-9) for haversine rounding headroom), because every
    * unsearched station sits > r bands away in latitude and is therefore
    * STRICTLY farther. The ring doubles each round, so the driver loop
    * is O(log(180/bandDeg)) with geometrically-shrinking unresolved
    * sets; the final forced round covers every band, so points always
    * resolve (an empty catalog resolves to an empty profile, matching
    * the broadcast form's cross join with nothing).
    *
    * Scale shape: both sides shuffle on the band key only; a dense band
    * is ordinary join skew (AQE-splittable). Catalog-size crossover vs
    * the broadcast tier is measured in SCALE.md. */
  def nearestStationProfileGrid(points: DataFrame, stations: DataFrame,
                                bandDeg: Double = 10.0): DataFrame = {
    require(bandDeg > 0, s"bandDeg must be positive, got $bandDeg")
    val st = stations
      .select(col("station_id"), col("s_lat"), col("s_lon"),
        floor(col("s_lat") / bandDeg).cast("long").as("_band"))
      .persist()
    // enough rings to cover the whole ±90° latitude range from any band
    val maxRadius = math.ceil(180.0 / bandDeg).toInt + 1
    var unresolved = points.select(col("point_id"), col("lat"), col("lon"),
      floor(col("lat") / bandDeg).cast("long").as("_pband"))
    var resolved = List.empty[DataFrame]
    var radius = 1
    var exhausted = false
    while (!exhausted) {
      val forced = radius >= maxRadius
      val offsets = (-radius to radius).map(o => col("_pband") + lit(o.toLong))
      val best = unresolved
        .withColumn("_band", explode(array(offsets: _*)))
        .join(st, "_band")
        .withColumn("_d", haversineKm(col("lat"), col("lon"),
          col("s_lat"), col("s_lon")))
        .groupBy("point_id")
        .agg(min(struct(col("_d"), col("station_id"))).as("_best"))
      val joined = unresolved.join(best, Seq("point_id"), "left")
        .withColumn("_accept", col("_best").isNotNull &&
          (lit(forced) || col("_best._d") <=
            lit(radius * bandDeg * kmPerDegLat * (1 - 1e-9))))
        .localCheckpoint(true) // cut lineage per ring; both filters below reuse it
      resolved ::= joined.filter(col("_accept"))
        .select(col("point_id"), col("_best.station_id").as("station_id"),
          col("_best._d").as("_d"))
      unresolved = joined.filter(!col("_accept"))
        .select("point_id", "lat", "lon", "_pband")
      exhausted = forced || unresolved.isEmpty
      radius = math.min(radius * 2, maxRadius)
    }
    st.unpersist()
    profile(resolved.reduce(_ unionByName _))
  }
}

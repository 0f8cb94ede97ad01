package graft.taxi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic schema detection → canonical projection.
  *
  * Spark-native replacement for the reference's per-file column sniffing
  * (`scripts/analytics_pandas.py:21-71` candidate lists + case-insensitive
  * exact-then-substring matching; same logic re-implemented in
  * `analytics_yellow.ipynb` cell 6 and `generate_notebooks_auto.py:78-96`).
  * Detection runs driver-side over `df.schema.fieldNames` only — no data
  * pass — and emits a single `select` projection, so at 100 TB it costs
  * one Catalyst projection node, never a scan.
  *
  * Also folds in fare reconstruction: when no fare column exists, sum the
  * available component columns with null→0 per row
  * (`analytics_pandas.py:26,141-151` `FARE_COMPONENTS`).
  */
object SchemaNormalizer {

  /** Candidate names, highest priority first (`analytics_pandas.py:21-28`). */
  private val pickupCands  = Seq("tpep_pickup_datetime", "lpep_pickup_datetime", "pickup_datetime")
  private val dropoffCands = Seq("tpep_dropoff_datetime", "lpep_dropoff_datetime", "dropoff_datetime", "dropOff_datetime")
  private val distCands    = Seq("trip_distance", "trip_miles")
  private val fareCands    = Seq("fare_amount", "base_passenger_fare")
  private val tipCands     = Seq("tip_amount", "tips")
  private val totalCands   = Seq("total_amount")
  private val puCands      = Seq("PULocationID", "PUlocationID")
  private val doCands      = Seq("DOLocationID", "DOlocationID")
  /** Components summed when no total exists (`analytics_pandas.py:26`). */
  private val fareComponents = Seq(
    "base_passenger_fare", "tolls", "bcf", "sales_tax", "congestion_surcharge",
    "airport_fee", "tips", "fare_amount", "extra", "mta_tax", "tip_amount",
    "tolls_amount", "improvement_surcharge")

  /** Case-insensitive exact match, then substring match — the reference's
    * two-phase rule (`analytics_pandas.py:30-55`). */
  private[taxi] def detect(fields: Seq[String], cands: Seq[String]): Option[String] = {
    val lower = fields.map(f => f.toLowerCase -> f).toMap
    cands.collectFirst { case c if lower.contains(c.toLowerCase) => lower(c.toLowerCase) }
      .orElse {
        cands.iterator.flatMap(c => fields.find(_.toLowerCase.contains(c.toLowerCase)))
          .nextOption()
      }
  }

  /** P8 tolerant coercion: a STRING source column parses with try_cast —
    * bad strings become NULL (the pandas `errors="coerce"` semantics of
    * `analytics_pandas.py:132-137`). A plain cast would THROW under
    * Spark 4's default ANSI mode on the first malformed value, turning
    * one bad row into a failed 100-TB job. Non-string sources keep the
    * plain cast (already typed; try_cast would only mask real bugs). */
  private def opt(df: DataFrame, name: Option[String], as: String, cast: String): Column =
    name.map { n =>
      if (df.schema(n).dataType == org.apache.spark.sql.types.StringType)
        col(n).try_cast(cast)
      else col(n).cast(cast)
    }.getOrElse(lit(null).cast(cast)).as(as)

  /** Project an arbitrary cab-type frame to [[TaxiSchemas.canonical]].
    * Missing columns become typed nulls (FHV has no fare/distance —
    * `cab_wise_analysis.ipynb` cell 9 "LIMITATION"). */
  def toCanonical(df: DataFrame, cabType: String): DataFrame = {
    val fs = df.schema.fieldNames.toSeq
    val fare = detect(fs, fareCands)
    val total = detect(fs, totalCands)
    // Fare reconstruction: no total column → sum present components,
    // null→0 per row (`analytics_pandas.py:141-151`).
    val totalCol: Column = total match {
      case Some(t) => col(t).cast("double")
      case None =>
        val present = fareComponents.filter(c => fs.exists(_.equalsIgnoreCase(c)))
          .flatMap(c => fs.find(_.equalsIgnoreCase(c)))
        if (present.isEmpty) lit(null).cast("double")
        else present.map(c => coalesce(col(c).cast("double"), lit(0.0))).reduce(_ + _)
    }
    df.select(
      lit(cabType).as("cab_type"),
      opt(df, detect(fs, pickupCands), "pickup_ts", "timestamp"),
      opt(df, detect(fs, dropoffCands), "dropoff_ts", "timestamp"),
      opt(df, detect(fs, puCands), "pu_zone", "int"),
      opt(df, detect(fs, doCands), "do_zone", "int"),
      opt(df, detect(fs, distCands), "distance_mi", "double"),
      opt(df, fare, "fare", "double"),
      opt(df, detect(fs, tipCands), "tip", "double"),
      totalCol.as("total"))
  }

  /** Union normalized frames across cab types — the Spark-native form of
    * `pd.concat(ignore_index=True)` over divergent schemas (SURVEY U1). */
  def unionCanonical(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}

package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone maps: per-zone (min, max, count) statistics of a QUERY column,
  * with zones defined by the table's LAYOUT — the data-skipping
  * metadata every columnar warehouse keeps per file/row-group (parquet
  * footers, ORC stripe stats, ClickHouse mark files). Spark already
  * prunes parquet row-groups with footer stats; this operator makes the
  * same machinery available AS DATA, for what implicit pruning can't
  * do: measure layout quality ("after this sort/Z-order, how much does
  * a typical range query actually skip?"), plan incremental jobs
  * ("which zones can contain yesterday's keys?"), or drive a
  * per-zone task dispatcher.
  *
  * The layout is abstracted as fixed-width bins of `layoutCol` — the
  * column the physical order follows (ingest timestamp, sort key,
  * [[graft.operators.ZOrder]] key). Zone membership is a pure row-local
  * function of the row (global min/max broadcast once), so the map is
  * exactly reproducible by any engine. One partial→final aggregate;
  * the map itself is `bins` metadata rows.
  *
  * The point of separating `layoutCol` from `statCol`: a zone map only
  * skips when the queried column correlates with the layout. Stats of
  * the layout key over its own zones are tight by construction; stats
  * of an uncorrelated column span every zone and [[skipReport]] says so
  * (`scan_fraction ≈ 1`) — the measurable "this layout doesn't serve
  * this query, re-cluster" diagnosis.
  */
object ZoneMap {

  /** Per-zone stats: zone id (fixed-width bin of `layoutCol`), row
    * count, `statCol` min/max. Rows with a null in either column are
    * excluded (a production layout would give nulls their own zone). */
  def build(df: DataFrame, layoutCol: String, statCol: String,
            bins: Int = 32): DataFrame = {
    require(bins > 0, s"ZoneMap.build: bins must be positive, got $bins")
    val vals = df
      .filter(col(layoutCol).isNotNull && col(statCol).isNotNull)
      .select(col(layoutCol).cast("double").as("l"),
        col(statCol).cast("double").as("c"))
    val mm = vals.agg(min("l").as("mn"), max("l").as("mx"))
    vals.crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("l") - col("mn")) / ((col("mx") - col("mn")) / bins))
              .cast("long"),
            lit(bins - 1L))).as("zone"),
        col("c"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_rows"),
        min("c").as("stat_min"), max("c").as("stat_max"))
      .orderBy("zone")
  }

  /** Zones a `[lo, hi]` range query on the stat column cannot skip
    * (interval overlap against the zone stats — metadata-only). */
  def overlapping(zoneMap: DataFrame, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"ZoneMap.overlapping: empty interval [$lo, $hi]")
    zoneMap.filter(col("stat_max") >= lo && col("stat_min") <= hi)
  }

  /** Fraction of rows a `[lo, hi]` stat-column query must scan under
    * this map — the layout-quality number (≈ query selectivity when the
    * stat column follows the layout, ≈ 1 when it is scattered). */
  def skipReport(zoneMap: DataFrame, lo: Double, hi: Double): DataFrame = {
    val kept = overlapping(zoneMap, lo, hi)
      .agg(count(lit(1)).as("zones_scanned"),
        coalesce(sum("n_rows"), lit(0L)).as("rows_scanned"))
    zoneMap.agg(count(lit(1)).as("zones_total"),
        sum("n_rows").as("rows_total"))
      .crossJoin(broadcast(kept))
      .select(col("zones_total"), col("zones_scanned"),
        col("rows_total"), col("rows_scanned"),
        round(col("rows_scanned") / col("rows_total"), 6).as("scan_fraction"))
  }
}

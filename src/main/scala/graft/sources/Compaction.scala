package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the lakehouse maintenance operator
  * behind Delta Lake's OPTIMIZE / Iceberg's rewrite_data_files: given a
  * file listing (path, bytes), assign files to target-sized output bins
  * so each rewrite task gets ~`totalBytes / nBins`. The assignment is
  * cumulative-size bucketing over a deterministic (size, path) order —
  * contiguous runs of small files coalesce into one bin, oversized
  * files land alone.
  *
  * Scale shape: a 100 TB table can carry tens of millions of data
  * files, so the listing itself must be treated as data, not driver
  * state. The cumulative size comes from the two-pass range-partitioned
  * prefix sum ([[graft.pipeline.Packing.withGlobalCumsumsBefore]]):
  * the only single-task window runs over ~shuffle.partitions bucket
  * totals, never over the listing. The grand total / bin target is a
  * scalar aggregate broadcast back. No sort, no collect.
  */
object Compaction {

  /** Plan `nBins` compaction bins over `files` (`pathCol`, `sizeCol`).
    * Returns per bin: file count, byte total, and fill ratio vs the
    * target size (ceil(total / nBins)). */
  def plan(files: DataFrame, pathCol: String, sizeCol: String,
           nBins: Int = 6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val f = files.select(col(pathCol).as("path"),
      col(sizeCol).cast("long").as("bytes"))
    val target = f.agg(ceil(sum("bytes") / lit(nBins.toDouble))
      .cast("long").as("_target"))
    graft.pipeline.Packing
      .withGlobalCumsumsBefore(f, Seq(col("bytes") -> "_cum_before"),
        "bytes", Some("path"))
      .crossJoin(broadcast(target))
      .withColumn("bin",
        floor(col("_cum_before").cast("double") / col("_target")).cast("int"))
      .groupBy("bin", "_target")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes"))
      .withColumn("fill_ratio",
        round(col("bytes").cast("double") / col("_target"), 4))
      .select("bin", "n_files", "bytes", "fill_ratio")
      .orderBy("bin")
  }
}

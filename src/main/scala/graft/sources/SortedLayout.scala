package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skip-friendly physical layout: partition by the filter column, SORT
  * WITHIN each file by the range column — the write-side half of data
  * skipping. Zone maps / parquet row-group statistics only prune when
  * the writer clustered the data; this writer guarantees it, and
  * [[footerStats]] PROVES it by reading the files' parquet footers
  * (the exact metadata a scan's predicate pushdown consults), not by
  * re-scanning rows.
  *
  * Scale shape: `repartition(partCol)` routes each partition value to
  * one task (co-locating its file), `sortWithinPartitions` is a
  * per-task sort — no global sort. At 100 TB you'd widen to
  * `repartitionByRange(partCol, sortCol)` for multiple sorted files
  * per partition; footerStats aggregates per partition either way.
  */
object SortedLayout {

  /** Write `df` partitioned by `partCol`, rows sorted by `sortCol`
    * within each file. */
  def writeSorted(df: DataFrame, dir: String, partCol: String,
                  sortCol: String): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write.partitionBy(partCol).mode("overwrite").parquet(dir)

  /** Per-partition census read from parquet FOOTERS only: file count,
    * footer row-count sum, and the min/max statistics of the INT64
    * column `tsCol`. One footer read per file — zero data pages
    * touched; this is the writer-side mirror of what predicate
    * pushdown will consult at scan time. */
  def footerStats(spark: SparkSession, dir: String, partCol: String,
                  tsCol: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    val rows = parts.map { p =>
      val value = p.getPath.getName.split("=", 2)(1)
      val files = fs.listStatus(p.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      var nRows = 0L
      var minV = Long.MaxValue
      var maxV = Long.MinValue
      files.foreach { f =>
        val reader = ParquetFileReader
          .open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val footer = reader.getFooter
          val idx = footer.getFileMetaData.getSchema.getFieldIndex(tsCol)
          footer.getBlocks.forEach { b =>
            nRows += b.getRowCount
            val st = b.getColumns.get(idx).getStatistics
            minV = math.min(minV,
              st.genericGetMin.asInstanceOf[java.lang.Long])
            maxV = math.max(maxV,
              st.genericGetMax.asInstanceOf[java.lang.Long])
          }
        } finally reader.close()
      }
      Row(value, files.size.toLong, nRows, minV, maxV)
    }
    val schema = StructType(Seq(
      StructField(partCol, StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("min_" + tsCol, LongType, nullable = false),
      StructField("max_" + tsCol, LongType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(partCol)
  }
}

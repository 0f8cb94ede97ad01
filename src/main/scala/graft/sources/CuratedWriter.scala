package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks and dimension sources (SURVEY §2.1 S9–S12).
  *
  * The reference writes curated months by hand-building
  * `{cab}/year=YYYY/month=MM/` paths and `coalesce(1)`-funneling each
  * month through one task (`spark_jobs/etl_yellow_s3.py:43-56`). Here the
  * layout comes from `partitionBy` — partition values round-trip through
  * the file index, so the reference's regex re-parsing of paths
  * (`analytics_summary.py:36-43`) is unnecessary — and file counts come
  * from AQE-coalesced shuffles rather than a 1-task write funnel.
  */
object CuratedWriter {

  /** S9: partitioned curated write. `maxRecordsPerFile` bounds output
    * file sizes without a coalesce funnel. */
  def writeCurated(trips: DataFrame, path: String,
                   maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitioned(trips, path,
      Seq("cab_type", "pickup_year", "pickup_month"), maxRecordsPerFile)

  /** Incremental month re-processing: dynamic partition overwrite
    * replaces ONLY the partitions present in `trips` and leaves the rest
    * of the curated tree intact — the reference's routine "re-run one
    * month" operation (`etl_yellow_s3.py` is invoked per month) without
    * rewriting or risking the other 300+ month partitions. */
  def writeCuratedIncremental(trips: DataFrame, path: String,
                              maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitionedIncremental(trips, path,
      Seq("cab_type", "pickup_year", "pickup_month"), maxRecordsPerFile)

  /** The [[writeCurated]] layout pattern for ANY table: overwrite-mode
    * partitioned parquet with bounded file sizes. Partition columns
    * become directory keys, so downstream filters on them prune at the
    * file index — the layout decision that makes a one-partition query
    * touch 1/Nth of a 100 TB tree. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** [[writeCuratedIncremental]] generalized: dynamic partition
    * overwrite replaces ONLY the partitions present in `df`, leaving
    * every other partition of the tree untouched — the "re-process one
    * slice" operation that never rewrites (or risks) the rest of a
    * 100 TB layout. */
  def writePartitionedIncremental(df: DataFrame, path: String,
                                  cols: Seq[String],
                                  maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** S10: small aggregate-table write (single file is intentional —
    * aggregate outputs are tiny). */
  def writeSummary(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** S11: CSV sink with header (`analytics_summary.py:63-75`).
    * Whitespace trimming is OFF: Spark's CSV writer strips leading/
    * trailing whitespace by default, which silently corrupts text
    * payloads (pandas `to_csv`, the reference sink, preserves them).
    * Read the result back with [[readCsv]] — plain `spark.read.csv`
    * re-trims and splits quoted embedded newlines. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Fidelity-preserving scan of a [[writeCsv]] output: no whitespace
    * trimming, quoted newlines kept inside one record (`multiLine`). */
  def readCsv(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("multiLine", "true")
      .schema(schema)
      .csv(path)

  /** JSON-lines sink: one JSON object per line. Unlike CSV, JSONL
    * round-trips every payload losslessly with no option juggling —
    * control characters are escaped, null and "" stay distinct — so
    * it's the interchange format for text corpora (every public crawl
    * distribution ships as JSONL). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Schema-enforced scan of a [[writeJsonl]] output (schema given
    * explicitly: inference would re-scan the data and can widen types). */
  def readJsonl(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** S12: zone-lookup dimension scan
    * (`scripts/generate_notebooks_auto.py:383-430`): header CSV with
    * schema enforcement; intended for `broadcast` joins. */
  def readZoneLookup(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(graft.taxi.TaxiSchemas.zoneLookup)
      .csv(path)

  /** Small-file compaction: rewrite a parquet tree with merged files.
    * Streaming sinks and frequent incremental writes accrete thousands
    * of tiny files, and scans then pay a per-file open/footer cost that
    * can exceed the read itself. Partitioned trees repartition on the
    * partition columns (all rows of a partition collapse into one task
    * → one file, `maxRecordsPerFile` re-splitting oversized ones);
    * unpartitioned trees merge `mergeFactor` input files per output.
    * Writes to a NEW path — swapping is the caller's atomic move; never
    * compact in place. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              partitionCols: Seq[String] = Nil, mergeFactor: Int = 16,
              maxRecordsPerFile: Long = 5000000L): Int = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(inPath)
    val shaped =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(math.max(1, df.inputFiles.length / mergeFactor))
    val writer = shaped.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(outPath)
    spark.read.parquet(outPath).inputFiles.length
  }

  /** Read back a curated tree (partition columns are reconstructed from
    * the directory layout by the file index). */
  def readCurated(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Lenient variant: skip corrupt/truncated objects instead of failing
    * the job — on a tree of millions of files one bad object is an
    * operational certainty, and the right failure mode for analytics is
    * "log and continue", not "kill a 1000-executor stage". Row-accurate
    * pipelines should reconcile counts against the manifest afterwards. */
  def readCuratedLenient(spark: SparkSession, path: String): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").parquet(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) table layout for co-located joins.
  *
  * At 100 TB, a fact-fact join repeated across jobs should not pay its
  * shuffle every run: writing both sides bucketed by the join key lets
  * sort-merge joins run with ZERO exchange — each task reads matching
  * buckets from both tables. This is the persistent form of the
  * repartition-before-join pattern. */
object Bucketing {

  /** Write `df` as a bucketed, sorted table registered in the session
    * catalog (bucketBy requires `saveAsTable`). The repartition on the
    * bucket key first is load-bearing: without it EVERY input task
    * writes one file per bucket it holds data for (up to tasks×buckets
    * small files — a 2000-partition fact at 32 buckets would emit 64k
    * files); with it each bucket is exactly one file. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.repartition(buckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans as a
    * SortMergeJoin with no Exchange on either side (asserted in
    * `BucketingSpec`). The merge hint keeps Spark from broadcasting a
    * side: this path exists for big-big joins where the shuffle, not
    * the broadcast, is the cost being avoided. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable), key)
}

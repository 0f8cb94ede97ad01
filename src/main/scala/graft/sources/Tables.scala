package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders over a scale-factor directory.
  *
  * Mirrors the reference's scan surface (SURVEY §2.1 S1–S3): plain parquet
  * scans (`spark_jobs/etl_yellow_s3.py:47`), directory/glob scans
  * (`spark_jobs/analytics_yellow_s3.py:12`), and footer-schema-only reads
  * (`scripts/analytics_pandas.py:88`). Column projection (S2) is left to
  * Catalyst: a `.select` after `load` prunes the parquet `ReadSchema`
  * automatically, so no hand-maintained column lists are needed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — illegal for the Spark
    * reader — so sessions set `spark.sql.legacy.parquet.nanosAsLong` and
    * this loader converts ns→timestamp with exact µs truncation. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  /** Footer-only schema read (SURVEY S3; `analytics_pandas.py:88`). */
  def schemaOf(s: SparkSession, dir: String, table: String) =
    load(s, dir, table).schema
}

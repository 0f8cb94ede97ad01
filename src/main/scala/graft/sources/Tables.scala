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

  /** The (table, column, type) census of every fixture table, from
    * footer-only reads — the gate surface for S3. Types are reported in
    * DuckDB's spelling so an independent `DESCRIBE` replay pins the
    * whole census (NTZ timestamps → `timestamp`, UTC-adjusted →
    * `timestamp with time zone`, exactly DuckDB's distinction; a
    * TIMESTAMP(NANOS) column would surface as `bigint` under the
    * session's nanosAsLong contract and need an oracle-side CASE —
    * the current fixtures carry none). */
  def schemaCensus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    def duckName(dt: DataType): String = dt match {
      case ByteType => "tinyint"
      case ShortType => "smallint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case FloatType => "float"
      case DoubleType => "double"
      case StringType => "varchar"
      case BooleanType => "boolean"
      case DateType => "date"
      case BinaryType => "blob"
      case TimestampType => "timestamp with time zone"
      case TimestampNTZType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(e, _) => duckName(e) + "[]"
      case other => other.sql.toLowerCase
    }
    val rows = names.flatMap { t =>
      schemaOf(s, dir, t).fields.map(f => (t, f.name, duckName(f.dataType)))
    }
    import s.implicits._
    rows.toDF("tbl", "col", "dtype").orderBy("tbl", "col")
  }
}

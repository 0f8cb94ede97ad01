package graft.sources

/** Ingestion-target discovery (SURVEY S7/S8,
  * `scripts/download_tlc_range_s3.py:30-60`, `scripts/list_targets.py`,
  * `retry_failed.py:42-71`): parse a TLC-style landing page for monthly
  * parquet links, classify each by (cab type, year, month), and run
  * downloads under exponential-backoff retry.
  *
  * Driver-side utility, not a Spark operator (the reference's scraper is
  * plain Python). The NETWORK step is injected as a function — this
  * environment has no egress, and the parsing/classification/retry logic
  * is the part with semantics worth testing.
  */
object TlcTargets {

  final case class Target(url: String, cabType: String, year: Int, month: Int)

  private val href = """href=["']([^"']+\.parquet)["']""".r
  // the reference's filename convention: <cab>_tripdata_YYYY-MM.parquet,
  // tolerant of _ / - between year and month (regex `(20\d{2})[-_]?([01]\d)`)
  private val namePat = """([a-z]+)_tripdata_(20\d{2})[-_]?(0[1-9]|1[0-2])\.parquet""".r

  /** All parquet hrefs on a landing page, in document order, deduped. */
  def parquetLinks(html: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    href.findAllMatchIn(html).foreach(m => seen += m.group(1))
    seen.toSeq
  }

  /** Classify a link by the reference's filename regex; None for
    * non-trip files (zone lookups, documentation, …). */
  def classify(url: String): Option[Target] = {
    val name = url.substring(url.lastIndexOf('/') + 1).toLowerCase
    name match {
      case namePat(cab, y, m) => Some(Target(url, cab, y.toInt, m.toInt))
      case _ => None
    }
  }

  /** Discovery = links → classified targets, filtered to a year range
    * and cab set (the reference's `--start-year/--end-year/--cab-types`
    * flags). */
  def discover(html: String, cabTypes: Set[String],
               fromYear: Int, toYear: Int): Seq[Target] =
    parquetLinks(html).flatMap(classify)
      .filter(t => cabTypes.contains(t.cabType) &&
        t.year >= fromYear && t.year <= toYear)

  /** Exponential-backoff retry (`download_tlc_range_s3.py:76-87`: 3
    * attempts, doubling delay). `sleep` injected for tests. Returns
    * Right(result) or Left(last error message) — callers record the
    * outcome in the [[Manifest]] rather than throwing, matching the
    * reference's continue-past-failures loop. */
  def withRetry[A](attempts: Int = 3, initialDelayMs: Long = 1000L,
                   sleep: Long => Unit = Thread.sleep)(op: () => A): Either[String, A] = {
    var delay = initialDelayMs
    var last = ""
    var i = 0
    while (i < attempts) {
      try return Right(op())
      catch {
        case e: Exception =>
          last = e.getMessage
          i += 1
          if (i < attempts) { sleep(delay); delay *= 2 }
      }
    }
    Left(last)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure driver-side logic — no Spark session needed. */
class TlcTargetsSpec extends AnyFunSuite {

  private val html =
    """<html><body>
      |<a href="https://d.cloud.example/trip-data/yellow_tripdata_2024-01.parquet">Yellow Jan</a>
      |<a href='https://d.cloud.example/trip-data/green_tripdata_2024_02.parquet'>Green Feb</a>
      |<a href="https://d.cloud.example/trip-data/fhvhv_tripdata_2023-12.parquet">HV Dec</a>
      |<a href="https://d.cloud.example/misc/taxi_zone_lookup.csv">zones</a>
      |<a href="https://d.cloud.example/misc/data_dictionary.pdf">docs</a>
      |<a href="https://d.cloud.example/trip-data/yellow_tripdata_2024-01.parquet">dup link</a>
      |</body></html>""".stripMargin

  test("parquet links are extracted in order and deduped") {
    val links = TlcTargets.parquetLinks(html)
    assert(links.size == 3)
    assert(links.head.endsWith("yellow_tripdata_2024-01.parquet"))
  }

  test("classification parses cab/year/month, tolerates - and _, skips non-trip files") {
    val ts = TlcTargets.parquetLinks(html).flatMap(TlcTargets.classify)
    assert(ts.map(t => (t.cabType, t.year, t.month)) ==
      Seq(("yellow", 2024, 1), ("green", 2024, 2), ("fhvhv", 2023, 12)))
    assert(TlcTargets.classify("https://x/zones.parquet").isEmpty)
    // invalid months never become download targets
    assert(TlcTargets.classify("https://x/yellow_tripdata_2024-13.parquet").isEmpty)
    assert(TlcTargets.classify("https://x/yellow_tripdata_2024-00.parquet").isEmpty)
  }

  test("discover filters by cab set and year range") {
    val ts = TlcTargets.discover(html, Set("yellow", "green"), 2024, 2024)
    assert(ts.map(_.cabType) == Seq("yellow", "green"))
  }

  test("retry backs off exponentially and reports the last error") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = TlcTargets.withRetry(attempts = 3, initialDelayMs = 100,
      sleep = delays.append(_)) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"boom $calls") else "ok"
    }
    assert(out == Right("ok"))
    assert(delays.toSeq == Seq(100L, 200L)) // doubled, no sleep after success
    // permanent failure -> Left with the LAST message, attempts exhausted
    var n = 0
    val bad = TlcTargets.withRetry(attempts = 3, initialDelayMs = 1, sleep = _ => ())(
      () => { n += 1; throw new RuntimeException(s"fail $n") })
    assert(bad == Left("fail 3") && n == 3)
  }
}

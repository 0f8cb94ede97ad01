package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  // layout position 0..999; "clustered" stat follows the layout,
  // "scattered" stat is a bit-mixed permutation of the same values
  private def table = (0 until 1000).map { i =>
    (i.toDouble, i.toDouble, ((i * 541) % 1000).toDouble)
  }.toDF("pos", "clustered", "scattered")

  test("zone stats are exact per fixed-width zone") {
    val zm = ZoneMap.build(table, "pos", "clustered", bins = 10).collect()
    assert(zm.length == 10)
    val z0 = zm.find(_.getLong(0) == 0L).get
    assert(z0.getLong(1) == 100L)
    assert(z0.getDouble(2) == 0.0 && z0.getDouble(3) == 99.0)
    val z9 = zm.find(_.getLong(0) == 9L).get
    // the max layout value joins the last zone (least() clamp)
    assert(z9.getLong(1) == 100L && z9.getDouble(3) == 999.0)
  }

  test("clustered stat skips; scattered stat scans everything") {
    val good = ZoneMap.build(table, "pos", "clustered", bins = 10)
    val bad = ZoneMap.build(table, "pos", "scattered", bins = 10)
    // a 10%-selectivity range query on the stat column
    val gr = ZoneMap.skipReport(good, 100.0, 199.0).collect().head
    assert(gr.getAs[Long]("zones_scanned") == 1L)
    assert(gr.getAs[Double]("scan_fraction") == 0.1)
    val br = ZoneMap.skipReport(bad, 100.0, 199.0).collect().head
    assert(br.getAs[Long]("zones_scanned") == 10L)
    assert(br.getAs[Double]("scan_fraction") == 1.0)
  }

  test("a query outside every zone scans nothing") {
    val zm = ZoneMap.build(table, "pos", "clustered", bins = 10)
    val r = ZoneMap.skipReport(zm, 5000.0, 6000.0).collect().head
    assert(r.getAs[Long]("zones_scanned") == 0L)
    assert(r.getAs[Long]("rows_scanned") == 0L)
    assert(r.getAs[Double]("scan_fraction") == 0.0)
    intercept[IllegalArgumentException](ZoneMap.overlapping(zm, 2.0, 1.0))
  }

  test("nulls are excluded; constant layout collapses to one zone") {
    val withNulls = Seq((Some(1.0), Some(10.0)), (None, Some(99.0)),
      (Some(2.0), None), (Some(3.0), Some(30.0))).toDF("pos", "v")
    val zm = ZoneMap.build(withNulls, "pos", "v", bins = 4).collect()
    assert(zm.map(_.getLong(1)).sum == 2L) // only the two complete rows
    val const = Seq((5.0, 1.0), (5.0, 2.0)).toDF("pos", "v")
    val one = ZoneMap.build(const, "pos", "v", bins = 8).collect()
    assert(one.length == 1 && one.head.getLong(0) == 0L)
  }
}

package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  private def data(n: Int) = (1 to n).map(i =>
    (s"g${i % 2}", i.toLong, 50.0 + (i % 21) - 10)).toDF("k", "id", "v")

  test("CI brackets the sample mean and is ordered") {
    val rows = Bootstrap.groupMeanCI(data(2000), "k", "id", "v")
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (m, lo, mid, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_mid"),
        r.getAs[Double]("boot_hi"))
      assert(lo <= mid && mid <= hi)
      assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
      // Poisson-bootstrap SE of a mean ≈ sd/√n — the band must be
      // sane, not degenerate or wild (sd ≈ 6, n = 1000 → SE ≈ 0.2)
      assert(hi - lo > 0.1 && hi - lo < 3.0, s"width ${hi - lo}")
    }
  }

  test("a constant column yields a zero-width interval at the constant") {
    val df = (1 to 500).map(i => ("g", i.toLong, 42.0)).toDF("k", "id", "v")
    val r = Bootstrap.groupMeanCI(df, "k", "id", "v").collect().head
    assert(r.getAs[Double]("boot_lo") == 42.0)
    assert(r.getAs[Double]("boot_hi") == 42.0)
    assert(r.getAs[Double]("mean") == 42.0)
  }

  test("deterministic: identical output across partitionings") {
    val a = Bootstrap.groupMeanCI(data(800), "k", "id", "v", b = 16)
      .collect().toSeq
    val b = Bootstrap.groupMeanCI(data(800).repartition(11), "k", "id", "v",
      b = 16).collect().toSeq
    assert(a == b)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  test("Column fold matches the plain-Scala reference on the full grid") {
    for (bits <- Seq(2, 3, 4)) {
      val n = 1 << bits
      val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
      val got = grid.toDF("x", "y")
        .withColumn("d", Hilbert.hilbertKey2(col("x"), col("y"), bits))
        .select("x", "y", "d").as[(Long, Long, Long)].collect()
      got.foreach { case (x, y, d) =>
        assert(d == Hilbert.hilbertKey2Ref(x, y, bits),
          s"bits=$bits ($x,$y): got $d, ref ${Hilbert.hilbertKey2Ref(x, y, bits)}")
      }
    }
  }

  test("the key is a bijection onto 0 until 4^bits") {
    val bits = 4
    val n = 1 << bits
    val ds = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .map { case (x, y) => Hilbert.hilbertKey2Ref(x, y, bits) }
    assert(ds.sorted == (0L until (n.toLong * n)).toSeq)
  }

  test("consecutive curve positions are grid-adjacent (true Hilbert walk)") {
    // THE property that distinguishes Hilbert from Morton: d and d+1 are
    // always Manhattan-distance-1 neighbors, so a file covering a d-range
    // covers one connected blob of the plane (Morton jumps quadrants)
    val bits = 4
    val n = 1 << bits
    val byD = (for { x <- 0 until n; y <- 0 until n } yield (x, y))
      .map { case (x, y) =>
        (Hilbert.hilbertKey2Ref(x.toLong, y.toLong, bits), (x, y)) }
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"($x1,$y1) -> ($x2,$y2) not adjacent")
    }
  }

  test("generated SQL unroll agrees with the Column fold via Spark SQL") {
    // the oracle's CTE chain is dialect-portable modulo `//` integer
    // division; rewrite that one token and replay the same unroll
    // passThrough is spliced into EVERY stage, so it must name columns
    // that exist unchanged at each level (x/y are mutated by the fold)
    val bits = 3
    val sql = Hilbert.hilbertSql2("x", "y", bits, "FROM grid", "x0, y0")
      .replace("//", "div")
    val n = 1 << bits
    (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong, x.toLong, y.toLong))
      .toDF("x", "y", "x0", "y0").createOrReplaceTempView("grid")
    val rows = spark.sql(
      s"WITH $sql SELECT x0, y0, d FROM h$bits")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == n * n)
    rows.foreach { case (x, y, d) =>
      assert(d == Hilbert.hilbertKey2Ref(x, y, bits), s"($x,$y)")
    }
    spark.catalog.dropTempView("grid")
  }

  test("Hilbert beats Morton on worst-case bucket spread") {
    // split the 16×16 grid into 16 equal d-ranges; the max side length
    // of any bucket's bounding box is smaller (or equal) under Hilbert
    // for every bucket, and strictly smaller in total
    val bits = 4
    val n = 1 << bits
    def spans(key: (Long, Long) => Long): Seq[Int] =
      (for { x <- 0 until n; y <- 0 until n } yield (x, y))
        .groupBy { case (x, y) => key(x.toLong, y.toLong) / 16 }
        .values.toSeq.map { cell =>
          val xs = cell.map(_._1); val ys = cell.map(_._2)
          (xs.max - xs.min) max (ys.max - ys.min)
        }
    val h = spans(Hilbert.hilbertKey2Ref(_, _, bits))
    // Morton reference: interleave bits
    def morton(x: Long, y: Long): Long =
      (0 until bits).foldLeft(0L) { (a, i) =>
        a | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)) }
    val z = spans(morton)
    assert(h.sum <= z.sum, s"hilbert ${h.sum} vs morton ${z.sum}")
    assert(h.max <= z.max)
  }
}

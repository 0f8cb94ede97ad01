package graft.operators

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteFrontier(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Double, Double)]): Seq[(Double, Double)] =
    Skyline.paretoFrontier2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq

  test("frontier on a hand-checkable staircase") {
    // frontier: (5,1), (3,4), (1,9); dominated: (2,2) by (3,4), (4,1) by (5,1)
    val pts = Seq((5.0, 1.0), (3.0, 4.0), (1.0, 9.0), (2.0, 2.0), (4.0, 1.0))
    assert(run(pts) == Seq((5.0, 1.0), (3.0, 4.0), (1.0, 9.0)))
  }

  test("same-x rivals: only the max y at each x can survive") {
    val pts = Seq((1.0, 1.0), (1.0, 5.0), (1.0, 3.0), (0.0, 6.0))
    assert(run(pts).toSet == Set((1.0, 5.0), (0.0, 6.0)))
  }

  test("duplicate points collapse to one frontier row") {
    val pts = Seq((2.0, 2.0), (2.0, 2.0), (1.0, 1.0))
    assert(run(pts) == Seq((2.0, 2.0)))
  }

  test("a totally ordered chain has a single frontier point") {
    val pts = Seq.tabulate(100)(i => (i.toDouble, i.toDouble))
    assert(run(pts) == Seq((99.0, 99.0)))
  }

  test("an anti-chain survives whole") {
    val pts = Seq.tabulate(50)(i => (i.toDouble, (49 - i).toDouble))
    assert(run(pts).toSet == pts.toSet)
  }

  test("matches the quadratic definition on pseudo-random points") {
    // deterministic LCG so the case is reproducible
    var s = 12345L
    def next(): Double = { s = (s * 1103515245L + 12345L) % 2147483648L; (s % 1000L).toDouble }
    val pts = Seq.fill(800)((next(), next()))
    assert(run(pts).toSet == bruteFrontier(pts))
  }

  test("partitioning layout does not change the frontier") {
    var s = 777L
    def next(): Double = { s = (s * 1103515245L + 12345L) % 2147483648L; (s % 500L).toDouble }
    val pts = Seq.fill(600)((next(), next()))
    val one = Skyline.paretoFrontier2D(pts.toDF("x", "y").coalesce(1), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val many = Skyline.paretoFrontier2D(pts.toDF("x", "y").repartition(16), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(one == many && one == bruteFrontier(pts))
  }

  test("null coordinates are excluded, not dominating") {
    val pts = Seq((Some(1.0), Some(1.0)), (None, Some(99.0)), (Some(2.0), None))
      .toDF("x", "y")
    val out = Skyline.paretoFrontier2D(pts, "x", "y").collect()
    assert(out.map(r => (r.getDouble(0), r.getDouble(1))).toSeq == Seq((1.0, 1.0)))
  }
}

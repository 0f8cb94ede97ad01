package graft.graph

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.triangleStats(edges.toDF("src", "dst")).collect().head

  test("K4: 4 triangles, clustering 1.0") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val r = stats(k4)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 12L) // 4 nodes x C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("clustering") == 1.0)
  }

  test("a path has wedges but no triangles") {
    val r = stats(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("n_wedges") == 2L)
    assert(r.getAs[Double]("clustering") == 0.0)
  }

  test("self-loops, parallel and reversed edges do not change the count") {
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val noisy = tri ++ Seq((1L, 0L), (0L, 0L), (2L, 1L), (0L, 1L))
    assert(stats(noisy).getAs[Long]("n_triangles") == 1L)
    assert(stats(noisy).getAs[Long]("n_edges") == 3L)
  }

  test("hub star plus one closing edge: exactly one triangle") {
    // hub 0 connected to 1..200; the only triangle is (0,1,2)
    val star = (1L to 200L).map((0L, _)) :+ (1L, 2L)
    val r = stats(star)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_edges") == 201L)
  }

  test("matches brute force on a pseudo-random graph") {
    var s = 42L
    def next(m: Long): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s % m }
    val edges = Seq.fill(400)((next(40), next(40)))
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val undSet = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      if undSet((nodes(i), nodes(j))) && undSet((nodes(j), nodes(k))) &&
        undSet((nodes(i), nodes(k)))
    } brute += 1
    val r = stats(edges)
    assert(r.getAs[Long]("n_triangles") == brute)
    assert(r.getAs[Long]("n_edges") == und.size.toLong)
  }

  test("localClustering: per-node coefficients on a known graph") {
    import spark.implicits._
    // K3 (0,1,2) plus pendant 3 attached to 0:
    // node 0: deg 3, 1 triangle → 2/(3·2) = 0.333333
    // nodes 1,2: deg 2, 1 triangle → 1.0; node 3: deg 1 → 0
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
      .toDF("src", "dst")
    val rows = Triangles.localClustering(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows == Map(
      0L -> ((3L, 1L, 0.333333)),
      1L -> ((2L, 1L, 1.0)),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((1L, 0L, 0.0))))
  }
}

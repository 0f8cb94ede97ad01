package graft.graph

import graft.SparkTestBase

class HitsSpec extends SparkTestBase {
  import spark.implicits._

  test("star graph: center is the sole authority, leaves are pure hubs") {
    // 1→0, 2→0, 3→0: node 0 has auth 1 (only in-link target), hub 0;
    // the three leaves split hub mass equally at 1/sqrt(3)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val m = Hits.hits(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(m(0L)._2 - 1.0) < 1e-12) // auth(center) = 1
    assert(math.abs(m(0L)._1) < 1e-12)       // hub(center) = 0
    val h = 1.0 / math.sqrt(3.0)
    Seq(1L, 2L, 3L).foreach { v =>
      assert(math.abs(m(v)._1 - h) < 1e-12)
      assert(math.abs(m(v)._2) < 1e-12)
    }
  }

  test("scores have unit L2 norm and ignore duplicate edges") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val rows = Hits.hits(edges, iters = 4).collect()
    val hubNorm = math.sqrt(rows.map(r => math.pow(r.getDouble(1), 2)).sum)
    val authNorm = math.sqrt(rows.map(r => math.pow(r.getDouble(2), 2)).sum)
    assert(math.abs(hubNorm - 1.0) < 1e-9)
    assert(math.abs(authNorm - 1.0) < 1e-9)
    intercept[IllegalArgumentException](Hits.hits(edges, iters = 0))
  }

  test("result is invariant to input partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 2L))
      .toDF("src", "dst")
    val one = Hits.hits(edges.coalesce(1), iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1) * 1e9).round,
        (r.getDouble(2) * 1e9).round)).toMap
    val many = Hits.hits(edges.repartition(7), iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1) * 1e9).round,
        (r.getDouble(2) * 1e9).round)).toMap
    assert(one == many)
  }
}

package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // three well-separated direction groups; ids chosen so each group's
  // keeper is its lowest id. KMeans with k=3 on this geometry puts each
  // group in its own cell regardless of seed.
  private def corpus = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.999f, 0.001f, 0f)),   // near-dup of 0
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(0f, 0.999f, 0.001f)),   // near-dup of 2
    (4L, Array(0f, 0f, 1f))            // singleton
  ).toDF("vec_id", "embedding")

  test("removals drops exactly the higher-id member of each near-dup pair") {
    val got = SemDedup.removals(corpus, tau = 0.95, nlist = 3)
      .orderBy("removed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (3L, 2L)))
  }

  test("dedup keeps the lowest-id member and all non-duplicates") {
    val kept = SemDedup.dedup(corpus, tau = 0.95, nlist = 3)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 4L))
  }

  test("a mutual dup-triple elects one keeper (the lowest id)") {
    val tri = Seq(
      (10L, Array(1f, 0f, 0f)),
      (11L, Array(0.9999f, 0.0001f, 0f)),
      (12L, Array(0.9998f, 0.0002f, 0f)),
      (13L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val removed = SemDedup.removals(tri, tau = 0.95, nlist = 2)
      .orderBy("removed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 11 and 12 both name 10 as keeper; 13 survives
    assert(removed.toSeq == Seq((11L, 10L), (12L, 10L)))
  }

  test("no pairs above threshold removes nothing") {
    val far = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(SemDedup.removals(far, tau = 0.95, nlist = 2).count() == 0)
  }
}

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

  test("multi-probe recovers a boundary-straddling pair that single " +
    "assignment misses, and is a superset of the single pass") {
    // two tight unit-norm clusters on the x / y axes plus a near-dup
    // pair at ~45°: KMeans k=2 splits the pair across the two cells
    // (each member is marginally closer to a different centroid), so
    // the single-assignment scan cannot see it — the documented recall
    // gap this method mitigates
    def unit(x: Double, y: Double) = {
      val n = math.sqrt(x * x + y * y)
      Array((x / n).toFloat, (y / n).toFloat, 0f)
    }
    def deg(d: Double) = unit(math.cos(math.toRadians(d)), math.sin(math.toRadians(d)))
    val rows = Seq(
      0L -> deg(0), 1L -> deg(0.5), 2L -> deg(1.0), 3L -> deg(1.5),
      10L -> deg(90), 11L -> deg(89.5), 12L -> deg(89.0), 13L -> deg(88.5),
      // the straddling near-dup pair: 16° apart (cos ≈ 0.961 ≥ 0.95),
      // symmetric about 45° so each member is nearer a different centroid
      20L -> deg(37), 21L -> deg(53))
    val df = rows.toDF("vec_id", "embedding")
    val single = SemDedup.removals(df, tau = 0.95, nlist = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = SemDedup.removalsMultiProbe(df, tau = 0.95, nlist = 2,
      nprobe = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the straddling pair: single misses it, multi finds it
    assert(!single.contains(21L), s"fixture drifted: $single")
    assert(multi.get(21L).contains(20L), s"boundary pair not recovered: $multi")
    // superset invariant: every single-pass removal survives, with the
    // same or a lower-id keeper
    single.foreach { case (rid, kept) =>
      assert(multi.contains(rid) && multi(rid) <= kept,
        s"removal $rid lost or keeper worsened: single=$single multi=$multi")
    }
    // with nprobe = nlist every cell is probed: the result must equal
    // the exact all-pairs computation (ids exactly, keeper = min id)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val da = a.map(_.toDouble); val db = b.map(_.toDouble)
      val dot = da.zip(db).map(p => p._1 * p._2).sum
      dot / (math.sqrt(da.map(x => x * x).sum) * math.sqrt(db.map(x => x * x).sum))
    }
    val exact = (for {
      (ia, ea) <- rows; (ib, eb) <- rows if ia < ib && cos(ea, eb) >= 0.95
    } yield (ib, ia)).groupBy(_._1).map { case (r, ps) => r -> ps.map(_._2).min }
    assert(multi == exact, s"nprobe=nlist must be exact: $multi vs $exact")
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

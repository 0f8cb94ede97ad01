package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkTestBase {
  import spark.implicits._

  // four well-separated value bands so k=4 has a clean optimum; ts
  // spreads hours 0..23
  private def events = (0 until 800).map { i =>
    (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"),
      (i % 4) * 100.0 + (i % 7))
  }.toDF("event_id", "ts", "value")

  test("clusterInvariantProfile: canonical ranks, all invariants hold") {
    val out = Clusters.clusterInvariantProfile(events).collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Int]("cluster_rank")).toSeq == Seq(0, 1, 2, 3))
    assert(out.forall(_.getAs[Long]("n_total") == 800L))
    assert(out.forall(_.getAs[Boolean]("nonempty")))
    assert(out.forall(_.getAs[Boolean]("centroid_in_hull")))
    assert(out.forall(_.getAs[Boolean]("centroids_distinct")))
    assert(out.forall(_.getAs[Boolean]("no_worse_than_global")))
  }

  test("fixed-seed fits are fully deterministic (what the gate pins on)") {
    // different seeds legitimately land in different local optima, so
    // the gate's stability rests on same-seed determinism: two
    // independent fits must produce byte-identical profiles, and the
    // canonical invariant profile must be identical too
    def raw() = Clusters.eventClusters(events, seed = 42L)
      .collect().map(_.toSeq).toSeq
    assert(raw() == raw())
    def canon() = Clusters.clusterInvariantProfile(events, seed = 42L)
      .collect().map(_.toSeq).toSeq
    assert(canon() == canon())
  }

  test("eventClusters: k labeled profiles partitioning all rows") {
    val out = Clusters.eventClusters(events).collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Int]("cluster")).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getAs[Long]("n")).sum == 800L)
    assert(out.forall(r => r.getAs[Double]("avg_hour") >= 0.0 &&
      r.getAs[Double]("avg_hour") <= 23.0))
  }

  test("null/invalid feature rows are skipped, not fatal") {
    val withBad = events.union(
      Seq((9001L, null.asInstanceOf[java.sql.Timestamp], 50.0),
        (9002L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), -5.0))
        .toDF("event_id", "ts", "value"))
    val out = Clusters.clusterInvariantProfile(withBad).collect()
    // both bad rows fall outside the feature domain -> n_total unchanged
    assert(out.forall(_.getAs[Long]("n_total") == 800L))
    assert(out.forall(_.getAs[Boolean]("nonempty")))
  }
}

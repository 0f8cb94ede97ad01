package graft.operators

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added, removed, changed; drops unchanged; null-safe compare") {
    val oldSnap = Seq(
      (1L, Some("a"), 10.0), // unchanged
      (2L, Some("b"), 20.0), // payload change
      (3L, Some("c"), 30.0), // removed
      (4L, None: Option[String], 40.0)) // null -> value change
      .toDF("k", "s", "v")
    val newSnap = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("b"), 21.0),
      (4L, Some("x"), 40.0),
      (5L, Some("e"), 50.0)) // added
      .toDF("k", "s", "v")
    val d = SnapshotDiff.diff(oldSnap, newSnap, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added"))
    val counts = SnapshotDiff.diffCounts(oldSnap, newSnap, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L))
  }

  test("republished keys violate diff's contract until normalized by dedupKeys") {
    val oldSnap = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "payload", "seq")
    // new snapshot republishes key 1 with a correction (two rows)
    val newRepub = Seq((1L, "a", 1L), (1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "payload", "seq")
    // raw diff goes many-to-many on key 1: one row per (old, new) pairing
    val raw = SnapshotDiff.diff(oldSnap, newRepub, "k", Seq("payload"))
      .filter($"k" === 1L).count()
    assert(raw == 1L) // 1 pairing survives the filter ('a'=='a' unchanged dropped, 'a'->'a2' changed)
    // normalized via dedupKeys (last-writer-wins) the diff is well-defined
    val d = SnapshotDiff.diff(oldSnap,
        SnapshotDiff.dedupKeys(newRepub, "k", "seq"), "k", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "changed", 3L -> "added"))
  }

  test("changeset round-trips: applyChangeset(old, changeset(old,new)) == new") {
    val oldSnap = Seq(
      (1L, Some("a"), 10.0), // unchanged — must NOT appear in the changeset
      (2L, Some("b"), 20.0), // changed
      (3L, Some("c"), 30.0), // removed
      (4L, None: Option[String], 40.0)) // null -> value change
      .toDF("k", "s", "v")
    val newSnap = Seq(
      (1L, Some("a"), 10.0),
      (2L, Some("b"), 21.0),
      (4L, Some("x"), 40.0),
      (5L, Some("e"), 50.0)) // added
      .toDF("k", "s", "v")
    val cs = SnapshotDiff.changeset(oldSnap, newSnap, "k", Seq("s", "v"))
    val ops = cs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(2L -> "upsert", 3L -> "delete", 4L -> "upsert", 5L -> "upsert"))
    // delete rows carry null payload; upserts carry the NEW payload
    val merged = SnapshotDiff.applyChangeset(oldSnap, cs, "k")
    val got = merged.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    val want = newSnap.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("applyChangeset fails fast on an unknown op value") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val bad = Seq((1L, "replace", "z")).toDF("k", "op", "s")
    val e = intercept[Exception] {
      SnapshotDiff.applyChangeset(base, bad, "k").collect()
    }
    assert(e.getMessage.contains("unknown op"))
  }

  test("incrementalAggUpdate == recompute, incl. group moves and vanishing groups") {
    import org.apache.spark.sql.functions._
    val oldSnap = Seq(
      (1L, "g1", 10.0), (2L, "g1", 20.0),  // g1: one delete, one update->g2
      (3L, "g2", 30.0),
      (4L, "g3", 40.0))                    // g3 vanishes entirely
      .toDF("k", "dim", "v")
    val changes = Seq(
      (1L, "delete", null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]),
      (2L, "upsert", "g2", java.lang.Double.valueOf(25.0)), // moves g1 -> g2
      (4L, "delete", null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]),
      (5L, "upsert", "g4", java.lang.Double.valueOf(5.0)))  // new group
      .toDF("k", "op", "dim", "v")
    val oldView = SnapshotDiff.aggView(oldSnap, "dim", "v")
    val rolled = SnapshotDiff.incrementalAggUpdate(oldView, oldSnap, changes,
        "k", "dim", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = SnapshotDiff.aggView(
        SnapshotDiff.applyChangeset(oldSnap, changes, "k"), "dim", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rolled == recomputed)
    assert(rolled == Set(("g2", 2L, 55.0), ("g4", 1L, 5.0))) // g1, g3 gone
    // an empty changeset is the identity
    val empty = changes.filter(col("k") < 0)
    val same = SnapshotDiff.incrementalAggUpdate(oldView, oldSnap, empty,
        "k", "dim", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(same == oldView.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("dedupKeys collapses republished keys last-writer-wins") {
    val snap = Seq(
      (1L, "v1", 100L), (1L, "v2", 200L), // republished: keep seq 200
      (2L, "w1", 50L))
      .toDF("k", "payload", "seq")
    val out = SnapshotDiff.dedupKeys(snap, "k", "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "v2", 2L -> "w1"))
  }
}

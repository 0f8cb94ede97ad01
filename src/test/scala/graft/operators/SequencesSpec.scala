package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

class SequencesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("counts first-occurrence orderings, not adjacency or volume") {
    // u1: a(0) b(5) a(9)  → a before b (the later a must not flip it)
    // u2: b(0) a(1) b(2)  → b before a
    // u3: a(0) b(1)       → a before b
    // u4: a only          → contributes to totals, no pair
    val df = Seq(
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(9), "a"),
      (2L, ts(0), "b"), (2L, ts(1), "a"), (2L, ts(2), "b"),
      (3L, ts(0), "a"), (3L, ts(1), "b"),
      (4L, ts(0), "a")).toDF("u", "t", "i")
    val rows = Sequences.orderedPairSupport(df, "u", "t", "i").collect()
    val m = rows.map(r => (r.getAs[String]("ant"), r.getAs[String]("cons"))
      -> (r.getAs[Long]("n_ordered"), r.getAs[Long]("n_both"),
        r.getAs[Double]("support"))).toMap
    assert(m(("a", "b")) == ((2L, 3L, 0.5)))   // u1, u3 of 4 users
    assert(m(("b", "a")) == ((1L, 3L, 0.25)))  // u2
    assert(rows.length == 2)
  }

  test("null keys/timestamps/items are excluded up front") {
    val df = Seq(
      (Some(1L), Some(ts(0)), Some("a")), (Some(1L), Some(ts(1)), Some("b")),
      (None, Some(ts(0)), Some("b")), (Some(2L), None, Some("a")),
      (Some(2L), Some(ts(3)), None))
      .toDF("u", "t", "i")
    val rows = Sequences.orderedPairSupport(df, "u", "t", "i").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("support") == 1.0) // 1 of 1 valid user
  }

  test("invariant to partitioning and row order") {
    val base = (1 to 500).map(i =>
      ((i % 40).toLong, ts(i * 7 % 211), s"e${i % 6}"))
    val a = Sequences.orderedPairSupport(base.toDF("u", "t", "i"),
      "u", "t", "i").collect().toSeq
    val b = Sequences.orderedPairSupport(
      scala.util.Random.shuffle(base).toDF("u", "t", "i").repartition(13),
      "u", "t", "i").collect().toSeq
    assert(a == b)
  }
}

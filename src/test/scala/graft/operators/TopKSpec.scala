package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("topKByGroup matches the row_number window formulation") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0), ("b", 6L, 2.0),
      ("c", 7L, 3.0)
    ).toDF("g", "id", "v")
    val got = TopK.topKByGroup(df, "g", "v", "id", k = 2)
      .orderBy("g", "rank").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // ties break on smaller id: (9.0,2) before (9.0,3); (2.0,5) before (2.0,6)
    assert(got.toSeq == Seq(
      ("a", 1L, 2L, 9.0), ("a", 2L, 3L, 9.0),
      ("b", 1L, 5L, 2.0), ("b", 2L, 6L, 2.0),
      ("c", 1L, 7L, 3.0)))
  }

  test("result is invariant to partitioning (partial merges are exact)") {
    val rows = (1 to 500).map(i => ("g" + (i % 7), i.toLong, (i * 37 % 101).toDouble))
    def run(parts: Int) =
      TopK.topKByGroup(rows.toDF("g", "id", "v").repartition(parts), "g", "v", "id", 5)
        .orderBy("g", "rank").collect().toSeq
    assert(run(1) == run(13))
  }

  test("buffer never exceeds k and insert keeps strict order") {
    val agg = new TopK.TopKAgg(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, ((i * 17 % 19).toDouble, i.toLong)))
    assert(buf.size == 3)
    assert(buf == buf.sortBy { case (v, id) => (-v, id) })
    // merge of two partials == reduce over the concatenated stream
    val (l, r) = (1 to 100).partition(_ % 2 == 0)
    val bl = l.foldLeft(agg.zero)((b, i) => agg.reduce(b, ((i * 17 % 19).toDouble, i.toLong)))
    val br = r.foldLeft(agg.zero)((b, i) => agg.reduce(b, ((i * 17 % 19).toDouble, i.toLong)))
    assert(agg.merge(bl, br) == buf)
  }
}

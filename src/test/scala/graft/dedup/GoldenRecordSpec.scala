package graft.dedup

import graft.SparkTestBase

class GoldenRecordSpec extends SparkTestBase {
  import spark.implicits._

  test("JW chains merge typo runs; census counts and canonicals check out") {
    val df = Seq(
      // block A: "martha" / "marhta" / "martha1" chain, plus a loner
      ("A", "martha", 1L), ("A", "marhta", 2L), ("A", "martha1", 3L),
      ("A", "zzz-unrelated", 9L),
      // block B: exact duplicates + a distinct name
      ("B", "acme corp", 10L), ("B", "acme corp", 11L), ("B", "nadir", 12L)
    ).toDF("blk", "name", "id")
    val rows = GoldenRecord.censusByBlock(df, "blk", "name", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // Block A sorted: marhta, martha, martha1, zzz — jw(marhta,martha)
    // and jw(martha,martha1) both ≥ .95 → one 3-cluster + one singleton
    assert(rows("A") == ((2L, 3L, 2L, 1L)),
      s"A: ${rows("A")} (clusters, merged, retired, canonSum)")
    // Block B: the two acme rows merge (canon id 10), nadir alone
    assert(rows("B") == ((2L, 2L, 1L, 10L)))
  }

  test("census is invariant to input partitioning and row order") {
    val rows = (0 until 400).map { i =>
      ("blk" + i % 4, "name" + (i % 40) + (if (i % 7 == 0) "x" else ""),
        i.toLong)
    }
    def run(seq: Seq[(String, String, Long)], parts: Int) =
      GoldenRecord.censusByBlock(seq.toDF("b", "n", "i").repartition(parts),
        "b", "n", "i").collect().map(_.toSeq).toSeq
    assert(run(rows, 1) == run(scala.util.Random.shuffle(rows), 16))
  }
}

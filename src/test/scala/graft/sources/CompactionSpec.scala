package graft.sources

import graft.SparkTestBase

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("bins follow the cumulative-size assignment") {
    // total 60, 3 bins → target 20; order (bytes, path):
    // a..d (5 each) fill bin 0 exactly; 10 and 30 land in bin 1
    val files = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L),
      ("e", 10L), ("f", 30L)).toDF("path", "bytes")
    val r = Compaction.plan(files, "path", "bytes", nBins = 3).collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
      x.getDouble(3))).toSeq ==
      Seq((0, 4L, 20L, 1.0), (1, 2L, 40L, 2.0)))
  }

  test("plan conserves every file and byte") {
    val files = (1 to 300).map(k => (f"f$k%04d", (k % 37 + 1).toLong * 100))
      .toDF("path", "bytes")
    val plan = Compaction.plan(files, "path", "bytes", nBins = 8)
    val (nf, nb) = plan
      .agg(org.apache.spark.sql.functions.sum("n_files"),
        org.apache.spark.sql.functions.sum("bytes"))
      .as[(Long, Long)].head()
    assert(nf == 300L)
    assert(nb == files.agg(org.apache.spark.sql.functions.sum("bytes"))
      .as[Long].head())
  }

  test("deterministic across partitionings") {
    val files = (1 to 500).map(k => (f"p$k%04d", (k * 31 % 97 + 1).toLong))
      .toDF("path", "bytes")
    val a = Compaction.plan(files, "path", "bytes", 6).collect().toSeq
    val b = Compaction.plan(files.repartition(23), "path", "bytes", 6)
      .collect().toSeq
    assert(a == b)
  }
}

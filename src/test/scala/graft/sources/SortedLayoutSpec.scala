package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SortedLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("files are value-clustered and row-sorted; footers match the data") {
    val dir = tempDir("graft_sorted_layout")
    val df = (0 until 5000).map { i =>
      ("t" + (i % 3), ((i * 7919) % 10000).toLong, i.toLong)
    }.toDF("k", "v", "id")
    SortedLayout.writeSorted(df, dir, "k", "v")

    // one file per partition value, and each file's rows are sorted
    val back = spark.read.parquet(dir)
    val perFile = back
      .select(col("k"), col("v"),
        input_file_name().as("f"),
        monotonically_increasing_id().as("ord"))
    val unsorted = perFile
      .withColumn("prev", lag("v", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy("ord")))
      .filter(col("prev").isNotNull && col("prev") > col("v"))
      .count()
    assert(unsorted == 0L, s"$unsorted out-of-order rows within files")

    // footer census equals the data census without reading data pages
    val stats = SortedLayout.footerStats(spark, dir, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val truth = df.groupBy("k")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((k, (files, n, mn, mx)) <- stats) {
      assert(files == 1L, s"$k: expected one file, got $files")
      assert((n, mn, mx) == truth(k), s"$k: footer $n/$mn/$mx vs ${truth(k)}")
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of rows share one key — the aggregation-skew shape.
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i.toDouble)
  }.toDF("key", "v")

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(skewed, "key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"),
      ("k4", "D"), ("k5", "E"), ("k6", "F"), ("k0", "G")).toDF("key", "label")
    val plain = skewed.join(dim, "key")
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key")
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(salted == plain)
  }

  test("keySkewReport surfaces the hot key with correct share and ratio") {
    val top = Relational.keySkewReport(skewed, "key", topK = 2).collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getLong(1) == 900L)
    assert(top.head.getDouble(2) == 0.9) // share of 1000 rows
    // 8 distinct keys (hot + k0..k6), max/avg = 900 / 125 = 7.2
    assert(top.head.getLong(3) == 8L)
    assert(top.head.getDouble(4) == 7.2)
    assert(top.length == 2)
  }
}

package graft.functions

import graft.SparkTestBase

/** The native expressions must be reachable from plain SQL via the
  * injected function registry (SparkSessionExtensions). */
class GraftExtensionsSpec extends SparkTestBase {

  test("custom functions are callable from spark.sql") {
    val r = spark.sql(
      """SELECT
           simhash_text('the quick brown fox') AS sh,
           size(shingle_hashes('a b c d e')) AS n_shingles,
           dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
           intersect_count_sorted(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ic
      """).collect().head
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Int]("n_shingles") == 3) // 5 tokens -> 3 shingles of 3
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Int]("ic") == 2)
  }

  test("SQL simhash equals the Column-API simhash") {
    import spark.implicits._
    val df = Seq("spark engines process data").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("SELECT simhash_text(text) AS s FROM ext_docs")
      .collect().head.getLong(0)
    val viaCol = graft.dedup.Dedup.withSimhash(df)
      .select("simhash").collect().head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("minhash_signature is usable in SQL over shingle_hashes") {
    val sig = spark.sql(
      "SELECT minhash_signature(shingle_hashes('w x y z w x'), 16) AS sig")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 16)
    assert(sig.forall(_ >= 0))
  }
}

package graft.ml

import graft.SparkTestBase

class IsolationForestSpec extends SparkTestBase {
  import spark.implicits._

  // dense cluster around (0, 0) plus two far outliers
  private def data = {
    val cluster = (0 until 500).map { i =>
      (i.toLong, math.sin(i * 0.73) * 2.0, math.cos(i * 1.31) * 2.0)
    }
    val outliers = Seq((9001L, 80.0, -75.0), (9002L, -90.0, 95.0))
    (cluster ++ outliers).toDF("id", "x", "y")
  }

  test("planted outliers get the highest anomaly scores") {
    val model = IsolationForest.fit(data, Seq("x", "y"), numTrees = 50)
    val top = model.transform(data)
      .orderBy(org.apache.spark.sql.functions.desc("anomaly_score"))
      .select("id").limit(2).collect().map(_.getLong(0)).toSet
    assert(top == Set(9001L, 9002L))
  }

  test("scores are in (0,1) and cluster points score below outliers") {
    val model = IsolationForest.fit(data, Seq("x", "y"), numTrees = 50)
    val scored = model.transform(data).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored.values.forall(s => s > 0.0 && s < 1.0))
    val clusterAvg = scored.filter(_._1 < 9000).values.sum / 500
    assert(scored(9001L) > clusterAvg + 0.1)
  }

  test("detect flags roughly the contamination fraction") {
    val flagged = IsolationForest.detect(data, Seq("x", "y"),
      contamination = 0.02, numTrees = 50)
      .filter("is_anomaly").count()
    assert(flagged >= 2 && flagged <= 30)
  }

  test("null/string features score null and are never flagged or top-ranked") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val withBad = data.withColumn("x",
      when(col("id") === 0L, lit(null)).otherwise(col("x")))
    val out = IsolationForest.detect(withBad, Seq("x", "y"), numTrees = 20)
    val badRow = out.filter(col("id") === 0L).head()
    assert(badRow.isNullAt(badRow.fieldIndex("anomaly_score")))
    assert(!badRow.getAs[Boolean]("is_anomaly"))
    // desc ordering must not put the null-feature row first (NaN would)
    val top = out.orderBy(desc("anomaly_score")).head()
    assert(top.getAs[Long]("id") != 0L)
    // string-typed feature column: casts, not ClassCastException
    val stringed = data.withColumn("x", col("x").cast("string"))
    val scored = IsolationForest.fit(stringed, Seq("x", "y"), numTrees = 10)
      .transform(stringed)
    assert(scored.filter(col("anomaly_score").isNull).count() == 0)
  }

  test("fit is deterministic for a fixed seed") {
    val a = IsolationForest.fit(data, Seq("x", "y"), numTrees = 20)
      .transform(data).select("anomaly_score").collect().map(_.getDouble(0)).toSeq
    val b = IsolationForest.fit(data, Seq("x", "y"), numTrees = 20)
      .transform(data).select("anomaly_score").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }
}

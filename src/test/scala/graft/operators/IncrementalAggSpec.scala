package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  test("delta rule equals full recompute on a mixed batch") {
    val base = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 5.0),
      ("b", 4L, 7.0), ("c", 5L, 1.0)).toDF("k", "id", "v")
    val view = IncrementalAgg.viewOf(base, "k", "v")
    // delete id 3, update id 1 -> 15.0, insert id 6 ("c", 9.0)
    val cdc = Seq(
      ("b", "delete", Some(5.0), None),
      ("a", "update", Some(10.0), Some(15.0)),
      ("c", "insert", None, Some(9.0))).toDF("k", "op", "before", "after")
    val maintained = IncrementalAgg.applyCdc(view, cdc, "k")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val recomputed = IncrementalAgg.viewOf(
        Seq(("a", 15.0), ("a", 20.0), ("b", 7.0), ("c", 1.0), ("c", 9.0))
          .toDF("k", "v"), "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(maintained.toSeq == recomputed.toSeq)
  }

  test("a key deleted down to zero rows disappears from the view") {
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val view = IncrementalAgg.viewOf(base, "k", "v")
    val cdc = Seq(("a", "delete", Some(1.0), Option.empty[Double]))
      .toDF("k", "op", "before", "after")
    val keys = IncrementalAgg.applyCdc(view, cdc, "k")
      .select("k").as[String].collect().toSet
    assert(keys == Set("b"))
  }

  test("an insert for a brand-new key materializes it") {
    val view = IncrementalAgg.viewOf(Seq(("a", 1.0)).toDF("k", "v"), "k", "v")
    val cdc = Seq(("z", "insert", Option.empty[Double], Some(4.0)),
      ("z", "insert", Option.empty[Double], Some(6.0)))
      .toDF("k", "op", "before", "after")
    val r = IncrementalAgg.applyCdc(view, cdc, "k")
      .filter(col("k") === "z").collect().head
    assert(r.getAs[Long]("n") == 2 && r.getAs[Double]("total") == 10.0)
  }

  test("random batches: maintained view equals recompute, any partitioning") {
    val base = (1 to 400).map(i => (s"k${i % 7}", i.toLong, (i % 53) * 1.5))
      .toDF("k", "id", "v")
    val view = IncrementalAgg.viewOf(base, "k", "v")
    val deletes = base.filter(col("id") % 5 === 0)
      .select(col("k"), lit("delete").as("op"), col("v").as("before"),
        lit(null).cast("double").as("after"))
    val updates = base.filter(col("id") % 7 === 0 && col("id") % 5 =!= 0)
      .select(col("k"), lit("update").as("op"), col("v").as("before"),
        (col("v") + 100).as("after"))
    val inserts = base.filter(col("id") % 11 === 0)
      .select(col("k"), lit("insert").as("op"),
        lit(null).cast("double").as("before"), (col("v") * 2).as("after"))
    val cdc = deletes.unionByName(updates).unionByName(inserts)
    val maintained = IncrementalAgg.applyCdc(view, cdc.repartition(9), "k")
      .select(col("k"), col("n"), round(col("total"), 6).as("t"))
      .orderBy("k").collect().toSeq
    val newBase = base.filter(col("id") % 5 =!= 0)
      .withColumn("v", when(col("id") % 7 === 0, col("v") + 100)
        .otherwise(col("v")))
      .select("k", "v")
      .unionByName(base.filter(col("id") % 11 === 0)
        .select(col("k"), (col("v") * 2).as("v")))
    val recomputed = IncrementalAgg.viewOf(newBase, "k", "v")
      .select(col("k"), col("n"), round(col("total"), 6).as("t"))
      .orderBy("k").collect().toSeq
    assert(maintained == recomputed)
  }
}

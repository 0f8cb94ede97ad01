package graft.operators

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "x", Some(1.5)),
    (2L, "y", Some(2.5)),
    (3L, "x", None),
    (4L, null.asInstanceOf[String], Some(1.5)))
    .toDF("id", "tag", "score")

  test("columnProfile: counts, nulls, distincts, typed extremes") {
    val rows = Profile.columnProfile(df, Seq("id", "tag", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "tag", "score"))
    val id = rows("id")
    assert(id.getLong(1) == 4L)           // n_rows
    assert(id.getLong(2) == 0L)           // n_null
    assert(id.getLong(3) == 4L)           // n_distinct
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7)) // numeric: no string extremes
    val tag = rows("tag")
    assert(tag.getLong(2) == 1L)          // one null tag
    assert(tag.getLong(3) == 2L)          // nulls don't count as distinct
    assert(tag.getString(6) == "x" && tag.getString(7) == "y")
    assert(tag.isNullAt(4) && tag.isNullAt(5))
    val sc = rows("score")
    assert(sc.getLong(2) == 1L && sc.getLong(3) == 2L)
    assert(sc.getDouble(4) == 1.5 && sc.getDouble(5) == 2.5)
  }

  test("columnProfile approx twin matches exact on small-cardinality data") {
    val exact = Profile.columnProfile(df, Seq("tag"), exact = true)
      .select("n_distinct").as[Long].head()
    val approx = Profile.columnProfile(df, Seq("tag"), exact = false)
      .select("n_distinct").as[Long].head()
    assert(exact == approx) // HLL is exact at tiny cardinality
  }
}

package graft.dedup

import graft.SparkTestBase

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("a line shared by >= minDocs docs is dropped everywhere") {
    val d = docs(
      1L -> "unique one\ncookie banner\nbody a",
      2L -> "cookie banner\nbody b",
      3L -> "Cookie Banner  \nbody c") // normalization: case + trim
    val out = Dedup.removeBoilerplateLines(d, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "unique one\nbody a")
    assert(out(2L).getString(1) == "body b")
    assert(out(3L).getString(1) == "body c")
    assert(out(1L).getLong(2) == 2 && out(1L).getLong(3) == 1)
  }

  test("within-doc repeats count once toward the doc-frequency threshold") {
    // the repeated line appears in only 2 DOCS; threshold 3 keeps it
    val d = docs(
      1L -> "dup\ndup\ndup\nx",
      2L -> "dup\ny",
      3L -> "z")
    val out = Dedup.removeBoilerplateLines(d, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "dup\ndup\ndup\nx")
    assert(out(2L) == "dup\ny")
  }

  test("empty lines never count as boilerplate; all-boiler doc survives empty") {
    val d = docs(
      1L -> "footer\n\nkeep1",
      2L -> "footer\n\nkeep2",
      3L -> "footer")
    val out = Dedup.removeBoilerplateLines(d, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "\nkeep1") // blank line kept
    assert(out(3L).getString(1) == "")
    assert(out(3L).getLong(2) == 0 && out(3L).getLong(3) == 1)
    // output is a total map: every input doc has a row
    assert(out.size == 3)
  }

  test("line order is preserved after removal") {
    val d = docs(
      1L -> "a\nboiler\nb\nboiler\nc",
      2L -> "boiler\nq",
      3L -> "boiler\nr")
    val out = Dedup.removeBoilerplateLines(d, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a\nb\nc")
  }
}

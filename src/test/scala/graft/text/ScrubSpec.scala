package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("redacts emails and IPv4s, leaves look-alikes alone") {
    val d = docs(
      (1L, "a", "mail me at jo.doe+x@sub.example.org today"),
      (2L, "a", "server 192.168.1.255 and 8.8.8.8 up"),
      (3L, "a", "versions 1.2.3 and 1.2.3.4.5 are not hosts, nor is a@b"),
      (4L, "a", "no pii here"))
    val out = Scrub.scrubPii(d).orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> and <IP> up")
    // 1.2.3 has only 3 octets; 1.2.3.4.5's prefix DOES match the first
    // four octets (no lookahead in RE2-safe patterns — documented);
    // a@b has no dotted TLD
    assert(out(2).contains("versions 1.2.3 and <IP>.5"))
    assert(out(2).endsWith("nor is a@b"))
    assert(out(3) == "no pii here")
  }

  test("scrub is idempotent and piiStats reports zero residual") {
    val d = docs(
      (1L, "a", "x@y.com from 10.0.0.1"),
      (2L, "b", "twice x@y.com x@y.com"))
    val once = Scrub.scrubPii(d)
    val twice = Scrub.scrubPii(once)
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
    val stats = Scrub.piiStats(once).orderBy("source").collect()
    assert(stats.map(_.getLong(2)).toSeq == Seq(1L, 2L)) // emails
    assert(stats.map(_.getLong(3)).toSeq == Seq(1L, 0L)) // ips
    assert(stats.map(_.getLong(4)).forall(_ == 0L))      // residual
  }

  test("blocklistAudit counts per-phrase hits and flags substring matches") {
    val d = docs(
      (1L, "a", "free money click here for free money"), // 2 phrases hit
      (2L, "a", "an innocent document"),
      (3L, "b", "click here"),                           // 1 phrase
      (4L, "b", "clickhere is not click here split"))    // substring: hits
    val r = Scrub.blocklistAudit(d, Seq("free money", "click here", "xyzzy"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    // doc 1 matches two DISTINCT phrases (hits counts phrases, not
    // occurrences — "free money" appears twice but contributes once)
    assert(r("a") == ((2L, 1L, 2L, 0.5)), r("a"))
    assert(r("b") == ((2L, 2L, 2L, 1.0)), r("b"))
    intercept[IllegalArgumentException] { Scrub.blocklistAudit(d, Nil) }
  }
}

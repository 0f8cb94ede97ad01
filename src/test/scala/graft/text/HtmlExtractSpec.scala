package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HtmlExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def blocksOf(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("html")
      .select(HtmlExtract.htmlToBlocks(col("html")).as("b"))
      .collect().head.getSeq[String](0)

  test("scripts and styles drop wholesale, including < and && in bodies") {
    val html = "<html><head><script type=\"text/javascript\">var x = 1 < 2 " +
      "&& y > 0;</script><style>p { color: red; }</style></head>" +
      "<body><p>kept text</p></body></html>"
    assert(blocksOf(html) == Seq("kept text"))
  }

  test("block tags segment, inline tags vanish without splitting words") {
    val html = "<body><h1>Title Here</h1><p>one <b>bo</b>ld word</p>" +
      "<ul><li>item 1</li><li>item 2</li></ul></body>"
    assert(blocksOf(html) == Seq("Title Here", "one bold word", "item 1", "item 2"))
  }

  test("comments drop; entities decode once (double-escape stays literal)") {
    val html = "<p>A &amp; B</p><!-- secret --><p>&lt;tag&gt; &amp;lt;raw&amp;gt; " +
      "&quot;q&quot; &#39;a&#39; x&nbsp;y</p>"
    assert(blocksOf(html) == Seq("A & B", "<tag> &lt;raw&gt; \"q\" 'a' x y"))
  }

  test("case-insensitive tags, attributes, whitespace collapse") {
    val html = "<DIV class=\"hero\"  data-x='1'>  spaced   out\n text </DIV>" +
      "<BR/><P>next</P>"
    assert(blocksOf(html) == Seq("spaced out text", "next"))
  }

  test("empty and tag-only documents yield zero blocks") {
    assert(blocksOf("") == Seq())
    assert(blocksOf("<html><body><div>  </div></body></html>") == Seq())
  }

  test("downstream text operators run unchanged on extracted output") {
    val docs = Seq(
      (0L, "<body><h1>the quick brown fox</h1><p>jumps over the lazy dog " +
        "and runs far away from home today</p></body>"),
      (1L, "<body><script>var x;</script><p>table scan query join filter " +
        "sort merge batch window value</p></body>")
    ).toDF("doc_id", "html")
    val extracted = HtmlExtract.extract(docs)
    assert(extracted.columns.toSet == Set("doc_id", "blocks", "text"))
    // token counting composes on the extracted text (tokens split on
    // single spaces, so the "\n" block joint merges fox+jumps: 4+12-1)
    val stats = extracted.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stats(0L) == 15 && stats(1L) == 10)
  }
}

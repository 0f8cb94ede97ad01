package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("two-pass cumsum equals the single-window reference") {
    // enough rows to span several range partitions, non-contiguous ids
    val df = (0 until 500).map(i => (i * 7L % 4993L, (i % 13) + 1L))
      .toDF("id", "n")
    val got = Packing.withGlobalCumsumBefore(df, col("n"), "id")
      .select("id", "cum_before")
    val ref = df.withColumn("cum_before",
      coalesce(sum("n").over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "cum_before")
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
  }

  test("packing assigns sequences and flags straddlers") {
    // stream: 3+4+5+2 tokens at seqLen 4 ->
    //   doc 1: [0,3)  seq 0
    //   doc 2: [3,7)  seqs 0-1 (straddles)
    //   doc 3: [7,12) seqs 1-2 (straddles)
    //   doc 4: [12,14) seq 3
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L)).toDF("doc_id", "nt")
    val out = Packing.packSequences(docs, 4, col("nt")).orderBy("doc_id")
      .select("doc_id", "seq_first", "seq_last", "n_seqs_spanned")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 0L, 1L), (2L, 0L, 1L, 2L),
      (3L, 1L, 2L, 2L), (4L, 3L, 3L, 1L)))
  }

  test("zero-token documents pin to their stream position") {
    val docs = Seq((1L, 4L), (2L, 0L), (3L, 1L)).toDF("doc_id", "nt")
    val out = Packing.packSequences(docs, 4, col("nt")).orderBy("doc_id")
      .select("doc_id", "seq_first", "seq_last").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 2 sits exactly at the 4-token boundary -> sequence 1, spans 1
    assert(out == Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("chunkDocuments: overlapping windows cover the text, tail clipped") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val chunks = Packing.chunkDocuments(docs, chunkChars = 4, overlap = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk")
      .as[(Long, Long, String)].collect().toSeq
    // doc 1 (len 10, stride 2): starts 0,2,4,6 -> last covers [6,10)
    assert(chunks == Seq(
      (1L, 0L, "abcd"), (1L, 1L, "cdef"), (1L, 2L, "efgh"), (1L, 3L, "ghij"),
      (2L, 0L, "abc")))
  }

  test("chunkDocuments: zero overlap partitions the text exactly") {
    val docs = Seq((1L, "abcdefgh"), (2L, "abcdefghi")).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, 4).orderBy("doc_id", "chunk_id")
      .select("chunk").as[String].collect().toSeq
    assert(out == Seq("abcd", "efgh", "abcd", "efgh", "i"))
    // coverage accounting: zero-overlap chunk mass equals text length
    val prof = Packing.chunkProfile(docs, 4)
      .select("doc_id", "n_chunks", "chunk_chars").as[(Long, Long, Long)]
      .collect().toSeq
    assert(prof == Seq((1L, 2L, 8L), (2L, 3L, 9L)))
  }

  test("sequenceProfile counts docs and straddlers per starting sequence") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L)).toDF("doc_id", "nt")
    val prof = Packing.sequenceProfile(docs, 4, col("nt"))
      .select("seq_id", "n_docs", "seq_tokens", "n_straddlers")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(prof == Seq((0L, 2L, 7L, 1L), (1L, 1L, 5L, 1L), (3L, 1L, 2L, 0L)))
  }
}

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

  test("sequenceProfile counts docs and straddlers per starting sequence") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L)).toDF("doc_id", "nt")
    val prof = Packing.sequenceProfile(docs, 4, col("nt"))
      .select("seq_id", "n_docs", "seq_tokens", "n_straddlers")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(prof == Seq((0L, 2L, 7L, 1L), (1L, 1L, 5L, 1L), (3L, 1L, 2L, 0L)))
  }
}

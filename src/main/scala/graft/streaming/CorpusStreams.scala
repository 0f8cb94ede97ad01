package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.dedup.Dedup

/** Document-corpus operators through the REAL streaming runtime — the
  * ingest-time shapes a training-data pipeline runs as new crawl
  * batches land, verified against their batch twins.
  *
  * Reference analogue: none (the reference is batch-only; its own
  * TODO list names streaming as future work) — beyond-reference scope
  * continuing the [[EventStreams]] suite, corpus-side.
  */
object CorpusStreams {

  /** Streaming near-dup screen against a static corpus — the streaming
    * twin of [[Dedup.crossCorpusNearDups]]: incoming documents arrive
    * as file micro-batches; each batch is minhash-signed and LSH-banded
    * ROW-LOCALLY (the codegen'd expressions are stateless, so they run
    * unchanged on a stream), stream-static joined against the
    * precomputed corpus band index, scored by signature agreement, and
    * emitted in Append mode.
    *
    * Every stage is STATELESS (projections + stream-static inner
    * joins): no watermark, no state store, and the emitted set is
    * independent of how the input splits into micro-batches — a pair
    * colliding in several bands emits once per band, deduplicated in
    * the batch epilogue, so the returned frame is EXACTLY the batch
    * twin's answer regardless of arrival order (the gate pins both to
    * one oracle).
    *
    * At deployment scale the static side is the persisted band index of
    * the accumulated corpus (signatures + band keys are 8·k bytes/doc —
    * the thing to save across ingest batches); here it is computed
    * fresh and frozen with an eager localCheckpoint so every
    * micro-batch probes the identical index. */
  def nearDupScreenThroughStream(spark: SparkSession, incoming: DataFrame,
                                 corpus: DataFrame, numHashes: Int = 64,
                                 bands: Int = 16, shingleK: Int = 3,
                                 maxBucket: Int = 64,
                                 reproducible: Boolean = false,
                                 tau: Double = 0.5,
                                 inputFiles: Int = 3): DataFrame = {
    val sigsC = Dedup.minhashSignatures(corpus, numHashes, shingleK,
      reproducible).localCheckpoint(eager = true)
    val bC = Dedup.bandedKeys(sigsC, numHashes, bands, reproducible)
    val bucketsC = bC.groupBy("band", "band_hash")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("bsz"))
      .localCheckpoint(eager = true)
    val smallC = bC.join(bucketsC, Seq("band", "band_hash"))
      .filter(col("bsz") <= maxBucket)
      .select(col("band"), col("band_hash"), col("doc_id").as("doc_corpus"))
      .localCheckpoint(eager = true)
    val starC = bucketsC.filter(col("bsz") > maxBucket)
      .select(col("band"), col("band_hash"), col("rep").as("doc_corpus"))
      .localCheckpoint(eager = true)
    val sigC = sigsC.select(col("doc_id").as("doc_corpus"),
      col("sig").as("sig_c"))

    val raw = EventStreams.throughStream(spark,
      incoming.select("doc_id", "text"), OutputMode.Append(), inputFiles) {
      stream =>
        val sigS = stream.select(col("doc_id").as("doc_in"),
          graft.functions.HashExpressions.minhashSignature(
            graft.functions.HashExpressions.shingleHashes(col("text"),
              shingleK, fnv = reproducible), numHashes).as("sig"))
        val bS = sigS.select(col("doc_in"), col("sig").as("sig_i"),
            posexplode(array(
              Dedup.bandKeyCols(numHashes, bands, reproducible): _*)))
          .select(col("doc_in"), col("sig_i"),
            col("pos").as("band"), col("col").as("band_hash"))
        val cands = bS.join(smallC, Seq("band", "band_hash"))
          .select(col("doc_in"), col("sig_i"), col("doc_corpus"))
          .union(bS.join(starC, Seq("band", "band_hash"))
            .select(col("doc_in"), col("sig_i"), col("doc_corpus")))
        cands.join(sigC, "doc_corpus")
          .select(col("doc_in"), col("doc_corpus"),
            (size(filter(zip_with(col("sig_i"), col("sig_c"),
              (x, y) => x === y), eq => eq)).cast("double") / numHashes)
              .as("est_jaccard"))
          .filter(col("est_jaccard") >= tau)
    }
    // per-band duplicate emissions collapse here (distinct on a stream
    // would need a state store; the stateless emit + batch epilogue is
    // exactly equivalent and arrival-order-proof)
    raw.distinct()
  }

  /** Streaming decontamination screen — the ingest twin of
    * [[graft.dedup.Decontaminate.report]]: incoming documents arrive as
    * file micro-batches, each batch's shingle hashes probe the
    * broadcast eval-set shingles (stateless stream-static inner join),
    * and contaminated doc ids emit in Append mode. The kept/dropped
    * census per language is a batch epilogue over the hit set, so the
    * result is independent of micro-batch arrival. Output schema is
    * exactly `Decontaminate.report`'s — one oracle pins both. */
  def decontaminateThroughStream(spark: SparkSession, incoming: DataFrame,
                                 evalDocs: DataFrame, k: Int = 8,
                                 inputFiles: Int = 3): DataFrame = {
    val evalSh = evalDocs
      .select(explode(graft.functions.HashExpressions
        .shingleHashes(col("text"), k, fnv = true)).as("sh"))
      .distinct().localCheckpoint(eager = true)
    val hits = EventStreams.throughStream(spark,
      incoming.select("doc_id", "text"), OutputMode.Append(), inputFiles) {
      stream =>
        stream.select(col("doc_id"),
            explode(graft.functions.HashExpressions
              .shingleHashes(col("text"), k, fnv = true)).as("sh"))
          .join(broadcast(evalSh), "sh")
          .select("doc_id")
    }.distinct()
    val kept = incoming.join(hits, Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    incoming.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy("lang")
  }
}

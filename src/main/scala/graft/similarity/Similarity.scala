package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: random-
  * hyperplane LSH bucketing so candidate generation touches only
  * same-bucket pairs — at 100 TB the full cross-join is infeasible, the
  * bucketed join shuffles on a small integer key. Dot products use
  * `zip_with` + `aggregate` (codegen'd builtins, no UDF); vectors are
  * cast to double before arithmetic for cross-engine numeric stability.
  */
object Similarity {

  /** Cosine similarity of two array columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb))
  }

  /** Exact brute-force top-k cosine neighbors for the given query ids.
    * Queries are a tiny frame → broadcast; candidates stream through
    * one pass; ranking is TakeOrdered per query via row_number. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long],
                     k: Int = 5): DataFrame = {
    val queries = embeddings
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = embeddings
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("sim"), 6).as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane signature (`nBits` sign bits packed into a long).
    * Deterministic pseudo-random hyperplanes derived from (bit, dim)
    * via a hash — no stored model needed, any executor recomputes the
    * same planes. */
  def hyperplaneSignature(emb: Column, dim: Int, nBits: Int = 16): Column = {
    val bits = (0 until nBits).map { b =>
      // plane_b[d] = deterministic pseudo-gaussian-ish weight in [-0.5, 0.5)
      val dot = (0 until dim).map { d =>
        val w = ((xxhash64(lit(b * 7919 + d)).cast("double") / 9.223372036854776e18) / 2.0)
        element_at(emb, d + 1).cast("double") * w
      }.reduce(_ + _)
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** ANN via LSH bucketing: same-signature pairs only. Recall is tunable
    * via nBits / multiple tables; this is the candidate-generation stage
    * of the standard banding scheme. */
  def lshNearNeighbors(embeddings: DataFrame, dim: Int, nBits: Int = 8,
                       minSim: Double = 0.8): DataFrame = {
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      hyperplaneSignature(col("embedding"), dim, nBits).as("bucket"))
    val a = sig.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = sig.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Embedding near-dup detection: cosine above threshold, LSH-bucketed;
    * falls back to reporting the top pairs so the operator has output
    * even on corpora without near-dups. */
  def topCosinePairs(embeddings: DataFrame, dim: Int, n: Int = 20): DataFrame = {
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      hyperplaneSignature(col("embedding"), dim, 4).as("bucket"))
    val a = sig.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = sig.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("sim"))
      .orderBy(desc("sim"), asc("id_a"), asc("id_b"))
      .limit(n)
  }
}

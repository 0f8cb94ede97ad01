package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.dotProduct

/** Product quantization (Jégou, Douze, Schmid, "Product quantization
  * for nearest neighbor search", TPAMI 2011) — the memory tier below
  * [[Ivf]]: each vector is split into `m` sub-vectors, each sub-vector
  * quantized to one of `k` codewords learned per subspace, so a
  * D-float vector compresses to `m` small codes (64 floats → 4 bytes
  * here, 64×). Queries score candidates with ASYMMETRIC distance (ADC):
  * a per-query lookup table of query-to-codeword distances per
  * subspace, summed over each candidate's codes — no decompression.
  *
  * Scale shape: codebooks are m·k sub-vectors (KBs) — trained once
  * (m KMeans fits), BROADCAST everywhere after. Encoding is a
  * (vector, block) × codeword argmin expressed as a broadcast join +
  * `min(struct(dist, code))` aggregation — declarative, partial→final,
  * no UDF. ADC scoring joins the m-codes-per-vector postings to the
  * broadcast per-query LUT and sums — shuffle volume is corpus × m
  * CODE rows (bytes each), never raw vectors; top-k per query is a
  * bounded window. The production refinement (LUT array in task
  * closure, fused scan) changes constants, not the shape. */
object Pq {

  /** (block, code, c_emb double[]) codebook rows; `m · k` of them. */
  final case class Model(codebooks: DataFrame, m: Int, k: Int, subDim: Int)

  private def blockSlices(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb
      .withColumn("e", transform(col("embedding"), _.cast("double")))
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(m - 1)),
        j => struct(j.as("block"),
          slice(col("e"), j * subDim + 1, lit(subDim)).as("sub")))).as("b"))
      .select(col("vec_id"), col("b.block").as("block"), col("b.sub").as("sub"))

  /** Train per-subspace codebooks: `m` KMeans fits over the block
    * slices. Deterministic under the fixed seed. */
  def train(embeddings: DataFrame, m: Int = 4, k: Int = 16,
            seed: Long = 42L): Model = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val slices = blockSlices(embeddings, m, subDim)
      .withColumn("features", array_to_vector(col("sub")))
      .persist()
    val spark = embeddings.sparkSession
    import spark.implicits._
    try {
      val rows = (0 until m).flatMap { j =>
        // 10 Lloyd iterations: codebook quality plateaus well before
        // the default 20 and the fit is half the gate's cost
        val model = new KMeans().setK(k).setSeed(seed + j).setMaxIter(10)
          .setFeaturesCol("features")
          .fit(slices.filter(col("block") === j))
        model.clusterCenters.zipWithIndex.map { case (c, code) =>
          (j, code, c.toArray)
        }
      }
      Model(rows.toDF("block", "code", "c_emb")
        .withColumn("c_sq", dotProduct(col("c_emb"), col("c_emb"))),
        m, k, subDim)
    } finally { slices.unpersist(); () }
  }

  /** Squared L2 via the codegen'd dot product:
    * ‖a−b‖² = a·a − 2a·b + b·b (b·b precomputed on the codebook). */
  private def sqDist(sub: org.apache.spark.sql.Column,
                     cEmb: org.apache.spark.sql.Column,
                     cSq: org.apache.spark.sql.Column) =
    dotProduct(sub, sub) - lit(2.0) * dotProduct(sub, cEmb) + cSq

  /** Encode every vector to its `m` codes: broadcast-join each block
    * slice against that block's codewords, argmin by
    * `min(struct(dist, code))` (deterministic tie-break), reassemble
    * the code array in block order. Output: (vec_id, codes int[]). */
  def encode(embeddings: DataFrame, model: Model): DataFrame =
    blockSlices(embeddings, model.m, model.subDim)
      .join(broadcast(model.codebooks), "block")
      .select(col("vec_id"), col("block"),
        struct(sqDist(col("sub"), col("c_emb"), col("c_sq")).as("d"),
          col("code").as("code")).as("dc"))
      .groupBy("vec_id", "block")
      .agg(min("dc").as("best"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("block"),
        col("best.code").as("code")))), s => s.getField("code"))
        .as("codes"))

  /** ADC top-`kNN` per query id: per-query LUT (query sub-vector to
    * every codeword, m·k rows, broadcast) joined to the exploded code
    * postings, summed, ranked. Ties broken by vec_id. */
  def adcTopK(codes: DataFrame, embeddings: DataFrame, model: Model,
              queryIds: Seq[Long], kNN: Int = 5): DataFrame = {
    val lut = blockSlices(
        embeddings.filter(col("vec_id").isin(queryIds: _*)),
        model.m, model.subDim)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(model.codebooks), "block")
      .select(col("query_id"), col("block"), col("code"),
        sqDist(col("sub"), col("c_emb"), col("c_sq")).as("d"))
    val posts = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("block", "code")))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    posts
      .join(broadcast(lut), Seq("block", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum("d").as("adc"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select("query_id", "rank", "vec_id", "adc")
      .orderBy("query_id", "rank")
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of embedding columns — the
  * standard 4× memory/IO shrink applied before an ANN index or a
  * similarity cache is built at corpus scale (100 TB of float32 vectors
  * → 25 TB of int8 + one float scale per vector).
  *
  * Everything here is row-local (no shuffle, no UDF — codegen'd
  * `transform`/`aggregate` builtins), so the operator composes with any
  * scan and pushes through partitioning untouched.
  *
  * Arithmetic contract (kept bit-reproducible across engines so a SQL
  * oracle can replay it): work in doubles; `scale = max_i |x_i| / 127`
  * (1.0 when the vector is all-zero); `q_i = floor(x_i/scale + 0.5)` —
  * explicit half-up rounding, NOT the platform `round`, because SQL
  * engines disagree on rounding mode at .5 (HALF_EVEN vs HALF_AWAY)
  * while `floor(y + 0.5)` is identical everywhere. |q_i| ≤ 127 by
  * construction and `|x_i − q_i·scale| ≤ scale/2`. */
object Quantize {

  private def dbl(vec: Column): Column = transform(vec, _.cast("double"))

  /** `scale` for a (double-cast) vector: max|x|/127, or 1 for the zero
    * vector (every q_i is then 0, dequantization is exact). */
  private def scaleOf(d: Column): Column = {
    val maxAbs = array_max(transform(d, x => abs(x)))
    when(maxAbs === 0d, lit(1d)).otherwise(maxAbs / 127d)
  }

  /** Adds `qvec` (array<bigint> in [-127,127]) and `scale` (double).
    * Ints are kept as BIGINT, not cast to TINYINT, because Spark arrays
    * of byte still occupy object slots in exchange buffers — the 4×
    * saving is realized at the SINK (parquet INT8 logical type /
    * byte-packed binary), not in the operator. */
  def quantizeInt8(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val d = dbl(col(vecCol))
    embeddings
      .withColumn("scale", scaleOf(d))
      .withColumn("qvec",
        transform(dbl(col(vecCol)), x => floor(x / col("scale") + 0.5d)))
  }

  /** Quantization audit: per input row, the worst absolute
    * reconstruction error and whether it honors the `scale/2` contract
    * (plus a tiny float slack). Emits exact-integer evidence (`q_sum`,
    * `q_min`, `q_max`) so a gate can pin the quantized values
    * themselves, not just the bound. */
  def reconstructionAudit(embeddings: DataFrame, vecCol: String = "embedding",
                          idCol: String = "vec_id"): DataFrame = {
    val q = quantizeInt8(embeddings, vecCol)
    val err = zip_with(dbl(col(vecCol)), col("qvec"),
      (x, qi) => abs(x - qi * col("scale")))
    q.select(col(idCol),
      aggregate(col("qvec"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"),
      array_min(col("qvec")).cast("long").as("q_min"),
      array_max(col("qvec")).cast("long").as("q_max"),
      (array_max(err) <= col("scale") * 0.5d + 1e-12).as("within_half_scale"))
  }
}

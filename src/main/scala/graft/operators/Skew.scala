package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for hot keys.
  *
  * AQE's skew-join handling (enabled in [[graft.GraftSession]]) covers
  * sort-merge joins at runtime; these helpers cover the two cases AQE
  * does not: aggregation skew (one group getting a whole executor's
  * work) and broadcast-infeasible skewed joins.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partially, then
    * re-aggregate by key. Identical result to a direct
    * `groupBy(key).agg(count, sum)` — but a key holding 30% of a 100 TB
    * table fans out over `salts` reducers in phase one instead of
    * funneling into a single task. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(valueCol).as("_sum"))
      .groupBy(col(key))
      .agg(sum("_cnt").as("cnt"), sum("_sum").as("total"))

  /** Salted join of a skewed fact against a dimension too large to
    * broadcast whole: the fact side gets a random salt in [0, salts),
    * the dim side is replicated `salts` times, and the join key becomes
    * (key, salt) — hot keys spread over `salts` tasks. */
  def saltedJoin(skewedFact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedFact = skewedFact.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}

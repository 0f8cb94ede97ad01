package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One alternating-least-squares round for implicit/explicit matrix
  * factorization (Hu, Koren & Volinsky, "Collaborative Filtering for
  * Implicit Feedback Datasets", ICDM 2008; Zhou et al., "Large-Scale
  * Parallel Collaborative Filtering for the Netflix Prize", AAIM 2008),
  * restricted to rank 1 so each half-step's normal equation is a scalar
  * ratio — which makes the whole round expressible as two join+aggregate
  * passes and therefore oracle-pinnable, while keeping the EXACT
  * distributed dataflow of full-rank ALS.
  *
  * Scale shape (identical at rank d): the ratings table is the only
  * corpus-sized object. Each half-step is a hash join of ratings with
  * the current factor side co-partitioned on the join key, followed by
  * a partial→final aggregate on the other key — per-executor state is
  * one factor per in-flight key, never a factor MATRIX. Item factors
  * here are seeded deterministically from the item id (`1 + id mod 7`),
  * so the user half-step needs no join at all: the init factor is a
  * row-local expression. Nothing is collected to the driver.
  *
  * Exactness: the user half-step's sums are integer-valued doubles, so
  * they are order-independent and bit-exact. The ITEM half-step sums
  * (`sum(_r*_f)`, `sum(_f*_f)`) accumulate arbitrary doubles in
  * partition-dependent order — associativity is only approximate there,
  * so the final `round(_, 4)` could in principle flip at an exact
  * rounding boundary across engines/partitionings (probability ~ulp;
  * widen the rounding headroom if a flaky gate ever appears).
  */
object Als {

  /** One user-step + one item-step of rank-1 ALS with L2 damping
    * `lambda`. Input: (`userCol`, `itemCol`, `ratingCol`) tuples,
    * pre-aggregated or raw (duplicates act as weight). Returns the
    * refreshed per-item factor with its rating support. */
  def rank1Round(ratings: DataFrame, userCol: String, itemCol: String,
                 ratingCol: String, lambda: Double = 1.0): DataFrame = {
    val r = ratings.select(col(userCol).as("_u"), col(itemCol).as("_i"),
      col(ratingCol).cast("double").as("_r"))
    // deterministic integer-valued init keeps the user-step numerators/
    // denominators EXACT doubles (order-independent sums), so the only
    // floating rounding before the final division is IEEE-exact
    val q0 = lit(1.0) + col("_i") % 7
    val userStep = r.groupBy("_u")
      .agg((sum(col("_r") * q0) / (lit(lambda) + sum(q0 * q0))).as("_f"))
    r.join(userStep, "_u")
      .groupBy("_i")
      .agg(count(lit(1)).as("n_ratings"),
        (sum(col("_r") * col("_f")) / (lit(lambda) + sum(col("_f") * col("_f"))))
          .as("_q"))
      .select(col("_i").cast("long").as("item"), col("n_ratings"),
        round(col("_q"), 4).as("factor"))
      .orderBy("item")
  }
}

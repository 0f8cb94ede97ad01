package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over event streams — the
  * marketing-analytics operator that splits each conversion's value
  * across the touchpoints that preceded it inside an attribution
  * window (linear / equal-credit model; conversions with no preceding
  * touch fall into a `direct` bucket). Kaufman et al.-style last-touch
  * is the n=1 special case of the same dataflow.
  *
  * Scale shape: the touch↔conversion pairing is an equi-join on the
  * subject key with a bounded time-range predicate — co-partitioned on
  * user, so the quadratic blow-up is per-user touches × conversions
  * INSIDE the window, never cross-user. Per-conversion touch counts
  * come from one aggregate on the pair table keyed by conversion id
  * (same partitioning, AQE-coalesced), and the `direct` remainder is a
  * left-anti join against that count table. No window functions, no
  * driver state, no skew beyond the user key (salting applies as in
  * [[Skew]] if one user dominates).
  */
object Attribution {

  /** Equal-credit attribution: every event of `convType` distributes
    * `valueCol` evenly over the same user's non-conversion events in
    * `(ts - windowDays, ts)`; untouched conversions credit `direct`.
    * Output per touch type: touch count and attributed value. */
  def linear(df: DataFrame, idCol: String, userCol: String, tsCol: String,
             typeCol: String, valueCol: String, convType: String,
             windowDays: Int = 3): DataFrame = {
    val conv = df.filter(col(typeCol) === convType)
      .select(col(idCol).as("_cid"), col(userCol).as("_u"),
        col(tsCol).as("_cts"), col(valueCol).cast("double").as("_v"))
    val touches = df.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("_u"), col(tsCol).as("_tts"),
        col(typeCol).as("touch_type"))
    val pairs = conv.join(touches, Seq("_u"))
      .filter(col("_tts") < col("_cts") &&
        col("_tts") >= col("_cts") - expr(s"INTERVAL $windowDays DAYS"))
      .select("_cid", "_v", "touch_type")
    val perConv = pairs.groupBy("_cid").agg(count(lit(1)).as("_n"))
    val credited = pairs.join(perConv, "_cid")
      .select(col("touch_type"), (col("_v") / col("_n")).as("_av"))
    val direct = conv.join(perConv, Seq("_cid"), "left_anti")
      .select(lit("direct").as("touch_type"), col("_v").as("_av"))
    credited.unionByName(direct)
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        round(sum("_av"), 4).as("attributed_value"))
      .orderBy("touch_type")
  }
}

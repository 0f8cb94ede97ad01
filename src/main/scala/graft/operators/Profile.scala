package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what is in this table" pass every
  * ingestion pipeline runs before trusting a new drop of data. The
  * reference eyeballs `df.describe()`/`df.info()` per notebook
  * (`part2.ipynb` cell 2, `cab_wise_analysis.ipynb` cell 3); here the
  * profile is a single declarative plan over any column subset.
  *
  * Scale shape: ONE scan of the table computes every per-column measure
  * as aggregates of the same pass (count/null-count/min/max are plain
  * partial→final combines). Exact `countDistinct` over k columns makes
  * Catalyst plan an Expand (k rows per input row) — still one scan, and
  * the exact form is what the oracle can pin. At 100 TB the
  * `exact = false` twin swaps in `approx_count_distinct` (HLL, constant
  * reducer state, no Expand) — same plan otherwise, the documented
  * scale path.
  */
object Profile {

  /** One row per profiled column: row count, null count, distinct count,
    * and min/max. Numeric columns report `min_num`/`max_num` (doubles);
    * all columns report lexical `min_str`/`max_str` cast AFTER
    * aggregation so numeric extremes stay numerically ordered. */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { c =>
      require(fields.contains(c),
        s"column '$c' not in schema: ${df.columns.mkString(", ")}")
      // names are spliced into stack()/alias SQL text below — quoting
      // metacharacters would corrupt it
      require(!c.contains("`") && !c.contains("'"),
        s"column name '$c' contains quoting characters")
    }
    val numericTypes =
      Set("double", "float", "decimal", "long", "integer", "short", "byte")
    def isNum(c: String) = numericTypes.exists(fields(c).typeName.startsWith)
    def distinctOf(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    // every measure for every column in one agg row → stack() reshapes
    // driver-free to the long per-column layout
    val measures: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinctOf(c).as(s"${c}__distinct"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__min_num"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__max_num"),
        (if (isNum(c)) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"${c}__min_str"),
        (if (isNum(c)) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"${c}__max_str"))
    }
    val one = df.agg(measures.head, measures.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', `${c}__rows`, `${c}__nulls`, `${c}__distinct`, " +
        s"`${c}__min_num`, `${c}__max_num`, `${c}__min_str`, `${c}__max_str`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(column, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str)"))
      .orderBy("column")
  }

  /** Inclusion-dependency probe for FK discovery: what fraction of
    * `child`'s distinct keys appear in `parent`? 1.0 = a valid foreign
    * key; 0.97 = orphans to chase. Exact form: distinct child keys
    * LEFT SEMI the parent (keys-only shuffle, payloads never move).
    * The sketch twin (d_overlap/d_left from
    * [[Joins.joinCardinalityEstimate]]'s HLL algebra) is the 100 TB
    * pre-flight — this method returns the exact figures a gate can pin.
    * Output one row: n_child_keys, n_contained, inclusion. */
  def inclusionExact(child: DataFrame, childKey: String,
                     parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k"))
      .filter(col("k").isNotNull).distinct()
    val pk = parent.select(col(parentKey).as("k")).filter(col("k").isNotNull)
    ck.join(pk, Seq("k"), "left_semi")
      .agg(count(lit(1)).as("n_contained"))
      .crossJoin(ck.agg(count(lit(1)).as("n_child_keys")))
      .select(col("n_child_keys"), col("n_contained"),
        round(col("n_contained").cast("double") / col("n_child_keys"), 4)
          .as("inclusion"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns, long
    * format (col_a, col_b, corr) — the multicollinearity screen of a
    * feature audit. ALL n·(n−1)/2 coefficients come out of ONE
    * aggregation pass (each `corr` is an independent partial→final
    * co-moment aggregate; Catalyst fuses them into a single
    * HashAggregate), then a constant-size stack to long format. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    val measures = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__${b}")
    }
    val one = df.agg(measures.head, measures.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', `${a}__${b}`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr)"))
      .orderBy("col_a", "col_b")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-heavy per-row stages.
  *
  * A scan's parallelism is bounded by file/row-group count; a small
  * single-row-group file runs any downstream per-row work on ONE core
  * until the first exchange. For stages whose per-row cost dominates
  * (signature computation, regex tokenization), spreading a too-narrow
  * input across the cluster costs one tiny shuffle of the raw rows and
  * unlocks full parallelism. At production scale inputs arrive with
  * natural parallelism (many files / row groups) and this is a no-op. */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles reads the FILE INDEX only — df.rdd.getNumPartitions
    // under AQE would eagerly execute every upstream stage just to read
    // a count, then re-execute them when the repartitioned frame runs.
    // Non-file-backed frames (joins, aggregates) report no input files
    // and pass through untouched: their parallelism already comes from
    // shuffle partitioning.
    val files = df.inputFiles.length
    if (files > 0 && files < target) df.repartition(target) else df
  }
}

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
    // File index + plan statistics only — df.rdd.getNumPartitions under
    // AQE would eagerly execute upstream stages just to read a count.
    // Non-file-backed frames (joins, aggregates) report no input files
    // and pass through: their parallelism comes from shuffle
    // partitioning. Few LARGE files also pass through — the reader
    // splits them into ~sizeInBytes/maxPartitionBytes tasks already, so
    // keying on file count alone would force a pointless full shuffle.
    val files = df.inputFiles.length
    if (files == 0) df
    else {
      val maxPart = math.max(1L,
        df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
      val estSplits = math.max(files.toLong,
        (df.queryExecution.optimizedPlan.stats.sizeInBytes / maxPart).toLong)
      if (estSplits < target) df.repartition(target) else df
    }
  }
}

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
      val conf = df.sparkSession.sessionState.conf
      val maxPart = math.max(1L, conf.filesMaxPartitionBytes)
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val estSplits = math.max(files.toLong, (bytes / maxPart).toLong)
      // The parallelism floor is SIZED, not a flat core count: blowing
      // a KB-sized input to defaultParallelism partitions pays a
      // shuffle plus `target` near-empty tasks in EVERY downstream
      // map-only stage (and one tiny output file per task on a write)
      // for microseconds of per-task work — measured r13 as the
      // dominant fixed cost of the dedup/band-index gate family. One
      // task per `filesOpenCostInBytes` (Spark's own tiny-input
      // amortization constant, 4 MB) keeps per-task work meaningful:
      // inputs under it stay as scanned, cluster-scale inputs hit the
      // `target` cap exactly as before, and the 100-TB pass-through
      // regime (estSplits >= target) is unchanged.
      val openCost = math.max(1L, conf.filesOpenCostInBytes)
      val sized = math.min(target.toLong,
        (bytes / openCost).toLong + 1).toInt
      if (estSplits < sized) df.repartition(sized) else df
    }
  }
}

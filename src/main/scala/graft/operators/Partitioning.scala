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
      // dominant fixed cost of the dedup/band-index gate family. The
      // per-task quantum is 1/16 of `filesOpenCostInBytes` (256 KB at
      // the 4 MB default): spread feeds COMPUTE-heavy per-row stages
      // (signing, shingling), so the quantum must be small enough that
      // a mid-size corpus still fans out — the full 4 MB quantum was
      // measured costing d5/d8/d21 ~1 s each of single-core signing at
      // sf0.1, while 256 KB keeps them parallel AND keeps KB-sized
      // inputs at a handful of tasks instead of 32. Cluster-scale
      // inputs hit the `target` cap exactly as before; the 100-TB
      // pass-through regime (estSplits >= target) is unchanged.
      val quantum = math.max(1L, conf.filesOpenCostInBytes / 16)
      val sized = math.min(target.toLong,
        (bytes / quantum).toLong + 1).toInt
      if (estSplits < sized) df.repartition(sized) else df
    }
  }
}

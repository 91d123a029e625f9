package graft.core

import org.apache.spark.sql.DataFrame

/** Partitioning guards for compute-heavy per-row stages.
  *
  * Small dimension-like inputs (one parquet file → one split) would
  * otherwise serialize expensive expressions (hashing, regex, vector
  * math) onto a single core; large inputs already carry enough splits
  * and must NOT be shrunk or reshuffled — hence conditional.
  */
object Partitioning {

  /** At least the session default parallelism before heavy compute;
    * no-op (no shuffle) when the input is already parallel enough.
    *
    * Parallelism is estimated statically — leaf file count and the
    * optimizer's size estimate divided by `files.maxPartitionBytes` —
    * NOT by materializing `df.rdd` (which would force a physical plan
    * outside AQE at the head of every compute pipeline).
    */
  def forCompute(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L,
      spark.sessionState.conf.filesMaxPartitionBytes)
    // stats.sizeInBytes is a BigInt and join/product estimates can
    // exceed Long.MaxValue — clamp before narrowing, or the low-64-bit
    // truncation can wrap negative and mis-estimate the split count.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = math.max(df.inputFiles.length.toLong,
      (bytes / maxSplit).min(BigInt(Long.MaxValue) - 1).toLong + 1)
    if (estSplits < target) df.repartition(target) else df
  }
}

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
    */
  def forCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

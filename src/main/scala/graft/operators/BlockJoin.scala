package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs self-join as a shuffle equi-join — the 1-Bucket-Theta
  * triangle pattern (Okcan & Riedewald, SIGMOD'11). Exact O(n²) pair
  * enumeration is sometimes the required semantics (exact near-dup
  * scans, exhaustive verification); what must NOT happen at scale is
  * planning it as a full-corpus BroadcastNestedLoopJoin. Here each row
  * hashes to one of `blocks` blocks and block pair (i ≤ j) is covered
  * exactly once: a block-g row replicates to keys (g, j≥g) on the left
  * and (i≤g, g) on the right, and the join runs on the (i, j) key —
  * per-task memory is bounded by ~2·n/blocks rows regardless of corpus
  * size, and the O(n²) compute spreads uniformly over blocks·(blocks+1)/2
  * tasks. Pick blocks ≈ n / sqrt(pairs-per-task-budget).
  */
object BlockJoin {

  /** Every unordered pair of distinct-id rows, exactly once (orientation
    * arbitrary for cross-block pairs — canonicalize downstream with
    * least/greatest). Each input column c emits twice as c_a / c_b.
    */
  def allPairs(df: DataFrame, idCol: String, blocks: Int = 8): DataFrame =
    allPairsManaged(df, idCol, blocks)._1

  /** [[allPairs]] plus a release handle for the internal cache — looped
    * callers (per-batch incremental dedup, round-based sweeps) must
    * release after consuming or the block-keyed input stays pinned in
    * storage memory across calls.
    */
  def allPairsManaged(df: DataFrame, idCol: String,
      blocks: Int = 8): (DataFrame, () => Unit) = {
    require(blocks > 0)
    // cached: both join sides derive from it — without the cache the
    // upstream plan (often hashing/normalization-heavy) runs twice.
    val base = df
      .withColumn("__blk", pmod(xxhash64(col(idCol)), lit(blocks)).cast("int"))
      .cache()
    val left = base.select(
      df.columns.map(c => col(c).as(s"${c}_a")).toSeq ++ Seq(
        col("__blk").as("__ba"),
        explode(sequence(col("__blk"), lit(blocks - 1))).as("__bj")): _*)
    val right = base.select(
      df.columns.map(c => col(c).as(s"${c}_b")).toSeq ++ Seq(
        col("__blk").as("__bb"),
        explode(sequence(lit(0), col("__blk"))).as("__bi")): _*)
    val pairs = left.join(right,
        col("__ba") === col("__bi") && col("__bj") === col("__bb") &&
          // same-block keys carry both orientations of a pair; cross-
          // block keys carry exactly one (triangle replication above)
          (col("__ba") =!= col("__bb") ||
            col(s"${idCol}_a") < col(s"${idCol}_b")))
      .drop("__ba", "__bj", "__bb", "__bi")
    (pairs, () => { base.unpersist(); () })
  }

  /** Every (left, right) pair across two frames (distinct ids) — the
    * rectangular sibling of [[allPairs]] for incremental shapes: each
    * left row replicates to all `blocks` keys, each right row carries
    * its one hashed block key, and the join is a plain shuffle
    * equi-join. Fragment-replicate without a broadcast: per-task memory
    * ≈ |left| + |right|/blocks, so a small new batch against an
    * arbitrarily large corpus needs no driver-side materialization and
    * no BNLJ. Columns emit as c_a (left) / c_b (right).
    */
  def crossPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      blocks: Int = 8): DataFrame = {
    require(blocks > 0)
    val l = left.select(
      left.columns.map(c => col(c).as(s"${c}_a")).toSeq :+
        explode(sequence(lit(0), lit(blocks - 1))).as("__bj"): _*)
    val r = right.select(
      right.columns.map(c => col(c).as(s"${c}_b")).toSeq :+
        pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("__bb"): _*)
    l.join(r, col("__bj") === col("__bb") &&
        col(s"${idCol}_a") =!= col(s"${idCol}_b"))
      .drop("__bj", "__bb")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign every document a position in
  * a fixed-length training-sequence stream — the "concatenate documents
  * in a deterministic shuffle order, then split into seqLen-token
  * chunks" step of LLM training-data preparation (GPT-style packing).
  * A document belongs to the pack where its first token lands
  * (`pack_idx = ⌊start_offset / seqLen⌋`), which is all a downstream
  * tokenizer-writer needs to materialize the actual chunks.
  *
  * Order comes from the same md5 hash variate as [[Sampling]] (salted,
  * reproducible, partition-stable — an RNG shuffle would repack
  * everything on every retry); the stream is SHARDED into `nBuckets`
  * independent substreams by the variate so the running-offset window
  * is per-bucket. That bounds the sequential-cumsum task at
  * corpus/nBuckets rows — the same documented recipe as
  * [[Sampling.tokenBudgetMixture]] — at the cost of one partial pack
  * at each bucket tail (nBuckets·seqLen/2 padding tokens expected,
  * negligible against a corpus). Size nBuckets ≈ cluster cores.
  */
object Packing {

  /** Output: every input column plus (bucket, n_tokens, start_offset,
    * pack_idx). `tokens` is the per-row token counter to pack by
    * (e.g. [[graft.functions.TextFunctions.tokenCount]]).
    */
  def packSequences(
      docs: DataFrame,
      keyCol: String,
      tokens: Column,
      seqLen: Long,
      nBuckets: Int,
      salt: String = ""): DataFrame = {
    require(seqLen >= 1 && nBuckets >= 1)
    // withColumn silently REPLACES existing columns — a frame already
    // carrying one of the output names would be corrupted, not errored
    val reserved = Seq("__u", "bucket", "n_tokens", "start_offset", "pack_idx")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"packSequences reserves output column(s) ${clash.mkString(", ")} — " +
        "rename them on the input frame")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("__u"), col(keyCol))
    docs
      // the variate is referenced twice (order + bucket): materialize it
      // once — lambda/expression re-evaluation trap
      .withColumn("__u", Sampling.hashUniform(col(keyCol), salt))
      .withColumn("bucket", floor(col("__u") * nBuckets).cast("long"))
      .withColumn("n_tokens", tokens)
      .withColumn("start_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("pack_idx",
        floor(col("start_offset") / lit(seqLen.toDouble)).cast("long"))
      .drop("__u")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: a 64-bit signature whose
  * Hamming distance approximates feature-set divergence.
  *
  * Bit i of the signature is the sign of Σ over shingles of
  * (xxhash64(shingle, i) > 0 ? +1 : -1) — 64 independent random
  * projections of the shingle set. Signature computation is fully
  * per-row (no shuffle, stays in the scan stage); pair generation
  * blocks on the 8 byte-chunks of the signature, which by pigeonhole
  * guarantees recall for pairs within Hamming distance 7 and
  * probabilistically catches larger distances.
  */
object SimHash {

  private val powers: Column = array((0 until 64).map(i => lit(1L << i)): _*)

  /** 64-bit SimHash of a shingle-array column, packed into a long.
    * Classic scheme: each shingle is hashed ONCE; bit i of that hash
    * votes ±1 on signature bit i (the hash array is materialized first
    * so the 64 bit-tests share one string hash per shingle).
    */
  def simhash64(shingles: Column): Column = {
    val hashes = transform(shingles, s => xxhash64(s))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L),
      (r, x) => r.bitwiseOR(x))
  }

  /** The 8 × 8-bit chunk keys of a signature (chunk index unrolled in
    * Scala so `shiftright`'s static shift applies).
    */
  def chunkKeys(sig: Column): Column =
    array((0 until 8).map { j =>
      struct(lit(j).as("chunk"),
        shiftright(sig, 8 * j).bitwiseAND(lit(255L)).as("ck"))
    }: _*)

  /** Per-doc signature frame: (id, simhash). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame =
    Shingling.shingleFrame(docs, idCol, textCol, n)
      .select(col("id"), simhash64(col("sh")).as("simhash"))

  /** Near-dup pairs with Hamming distance ≤ maxDist. Blocking join
    * shuffles on (chunk, chunk-value) — 256 values per chunk keeps
    * buckets dense; for corpora ≫ 10⁹ docs widen to 16-bit chunks.
    * Output: (doc_a, doc_b, hamming).
    */
  def nearPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int,
      n: Int = 2): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, n)
    // cached: the self-join would otherwise recompute the whole
    // signature pipeline once per side
    val chunked = sigs
      .select(col("id"), col("simhash"), explode(chunkKeys(col("simhash"))).as("c"))
      .select(col("id"), col("simhash"),
        col("c.chunk").as("chunk"), col("c.ck").as("ck"))
      .cache()
    val a = chunked.as("a")
    val b = chunked.as("b")
    // Hamming predicate lives IN the join so false chunk-collisions are
    // discarded at probe time, before the (much smaller) distinct.
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id") &&
          expr("bit_count(a.simhash ^ b.simhash)") <= maxDist)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .distinct()
  }
}

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

  /** The `nChunks` contiguous chunk keys of a 64-bit signature (chunk
    * index unrolled in Scala so `shiftright`'s static shift applies;
    * widths differ by at most one bit when nChunks ∤ 64). By pigeonhole,
    * two signatures within Hamming distance nChunks−1 share at least
    * one chunk — blocking on chunks is EXACT for that distance.
    */
  def chunkKeys(sig: Column, nChunks: Int = 8): Column = {
    require(nChunks >= 1 && nChunks <= 64)
    val base = 64 / nChunks
    val rem = 64 % nChunks
    var off = 0
    val parts = (0 until nChunks).map { j =>
      val w = if (j < rem) base + 1 else base
      val mask = if (w == 64) -1L else (1L << w) - 1
      val k = struct(lit(j).as("chunk"),
        shiftright(sig, off).bitwiseAND(lit(mask)).as("ck"))
      off += w
      k
    }
    array(parts: _*)
  }

  /** Per-doc signature frame: (id, simhash). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame =
    Shingling.shingleFrame(docs, idCol, textCol, n)
      .select(col("id"), simhash64(col("sh")).as("simhash"))

  /** Near-dup pairs with Hamming distance ≤ maxDist — EXACT: blocking
    * uses maxDist+1 chunks, so by pigeonhole every qualifying pair
    * shares a chunk (driver-checked against exhaustive all-pairs as
    * q44). Cost dial: chunk width is 64/(maxDist+1) bits, so bucket
    * density grows as corpus/2^width — small maxDist (≤7) keeps chunks
    * ≥8 bits and buckets sparse at any scale; large maxDist on a 64-bit
    * signature is inherently closer to all-pairs (widen the signature
    * to 128 bits before widening maxDist past ~15 at ≫10⁹ docs).
    * Output: (doc_a, doc_b, hamming).
    */
  def nearPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int,
      n: Int = 2): DataFrame =
    nearPairsFromSignatures(signatures(docs, idCol, textCol, n), maxDist)

  /** [[nearPairs]] over a precomputed (id, simhash) frame — callers that
    * also need the signatures elsewhere (e.g. the q44 exhaustive check)
    * compute them once.
    */
  def nearPairsFromSignatures(sigs: DataFrame, maxDist: Int): DataFrame = {
    // cached: the self-join would otherwise recompute the whole
    // signature pipeline once per side
    val chunked = sigs
      .select(col("id"), col("simhash"),
        explode(chunkKeys(col("simhash"), maxDist + 1)).as("c"))
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

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter set membership as a scan-stage predicate — the 100 TB
  * path for "does this row's key appear in that (much smaller) set?"
  * without a join: build the sketch over the small side once
  * (distributed partial sketches, OR-merged), then filter the huge side
  * with a codegen'd `might_contain` that never shuffles.
  *
  * Built on Spark's own sketch machinery — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
  * Catalyst injects for runtime row-group filtering — accessed through
  * the engine's `private[sql]` bridge, so the probe compiles into
  * whole-stage codegen next to the scan instead of running as a UDF.
  *
  * Guarantee direction (the invariant q66 oracles): NO FALSE NEGATIVES
  * — a key that is in the set always probes true; false positives occur
  * at ≤ fpp and only ever flag extra rows. That is exactly the safe
  * direction for decontamination (drop a little extra, never leak an
  * eval match through) and for join pre-filtering (never lose a match).
  *
  * Complements [[Contamination]]: winnowing containment catches shared
  * PASSAGES inside long documents; the Bloom path catches whole-document
  * (fingerprint) membership at a fraction of the cost — one sketch
  * shipped to the probe side instead of a fingerprint inverted index.
  *
  * Sketch shipping and the size bound: the probe embeds the serialized
  * sketch as a plan LITERAL (the same shape Spark's own runtime-filter
  * injection uses), so the bytes ride in every serialized task binary
  * and in plan strings — NOT in a broadcast variable. That is the right
  * trade at the intended scale (eval-set decontamination: 10⁶-10⁸ keys
  * → 1.2-120 MB) but a hazard past it: 10⁹ items at 1% fpp is ~1.2 GB
  * of bits, which would bloat every task and plan dump. Practical
  * bound: keep `expectedItems` ≤ ~10⁸ (sketch ≤ ~120 MB); past that,
  * fall back to the fingerprint equi-join ([[Contamination]]) whose
  * reference side stays distributed.
  */
object BloomMembership {

  /** Serialized Bloom filter over `key`, sized for `expectedItems` at
    * `fpp`. One eager, driver-bounded job (the q63 freqItems contract):
    * the driver holds only the sketch — `optimalNumOfBits/8` bytes,
    * ~1.2 MB for 10⁶ items at 1% — never the keys. Returns None when
    * the frame is empty.
    */
  def bloomBytes(
      df: DataFrame,
      key: Column,
      expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // null keys are excluded from the build: xxhash64(null) would fold
    // to the constant seed, putting "null" in the set and making EVERY
    // null-keyed probe a guaranteed hit — equi-join semantics (null
    // matches nothing) are what the doc promises
    val row = df.filter(key.isNotNull).agg(bridge.column(agg).as("bf")).head()
    Option(row.getAs[Array[Byte]](0))
  }

  /** Membership probe against a built sketch: true when `key` MAY be in
    * the set (false ⇒ definitely absent; null keys are definitely
    * absent, matching equi-join semantics). Pure codegen'd scalar —
    * use it directly in `filter`/`when` at the scan.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    key.isNotNull && bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), bridge.expression(xxhash64(key))))

  /** Rows of `corpus` whose `key` may appear among `refKeys` (superset
    * of the exact matches; ≤ fpp false-positive excess). Empty
    * reference set ⇒ no rows. The big-side work is one scan-stage
    * filter; nothing is joined or shuffled.
    */
  def probableMatches(
      corpus: DataFrame,
      key: Column,
      refKeys: DataFrame,
      refKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    bloomBytes(refKeys, refKey, expectedItems, fpp) match {
      case Some(bytes) => corpus.filter(mightContain(bytes, key))
      case None        => corpus.filter(lit(false))
    }

  /** `corpus` minus probable matches — Bloom-guarded decontamination.
    * Sound (an exact match can never survive) but lossy at ≤ fpp: rows
    * dropped by a false positive are the accepted cost of skipping the
    * join. For the exact variant, feed [[probableMatches]] into an
    * equi-join on the ~fpp-sized survivor set instead.
    */
  def decontaminate(
      corpus: DataFrame,
      key: Column,
      refKeys: DataFrame,
      refKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    bloomBytes(refKeys, refKey, expectedItems, fpp) match {
      case Some(bytes) => corpus.filter(!mightContain(bytes, key))
      case None        => corpus
    }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** Document fingerprinting by winnowing (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 — the MOSS algorithm): hash every character k-gram, slide
  * a window of w consecutive hashes, keep each window's minimum; the
  * distinct kept hashes are the document's fingerprint set.
  *
  * Guarantee: any substring shared by two documents of length ≥ w+k−1
  * characters contributes at least one common fingerprint (every
  * w-window inside the match selects the same minimum), while per-doc
  * storage is ~2/(w+1) of the gram count — position-robust partial-
  * overlap detection that set-based shingling (Jaccard/MinHash, which
  * normalize away ordering and locality) cannot express.
  *
  * Complements the other dedup families: NGramJaccard/MinHash measure
  * whole-document set similarity; SimHash measures weighted-feature
  * distance; winnowing finds documents sharing any sufficiently long
  * passage (quotation, boilerplate, plagiarism) regardless of how
  * different the rest is.
  *
  * Plan shape: two narrow projections per document (grams→hashes, then
  * window minima) with every intermediate materialized as its own
  * column — the HOF-lambda re-evaluation trap (see Shingling) would
  * otherwise re-hash the document once per window. The pair join is a
  * standard inverted-index equi-join on the fingerprint value.
  *
  * Scale notes: per-row cost is O(len·w) lambda steps; at 100 TB
  * prefer the 64-bit hash (`hash = xxhash64`) — long keys shuffle ~5×
  * smaller than md5 hex strings (the md5 default exists for
  * SQL-oracle parity and cross-system reproducibility). Window minima
  * of a hot gram concentrate on one fingerprint value; df-cap the
  * inverted index (`maxDf`) exactly as NGramJaccard does if a corpus
  * carries megadup boilerplate.
  */
object Winnowing {

  /** Per-doc fingerprint sets: (id, fps array<string|long>). */
  def fingerprintFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      hash: Column => Column = md5): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    Partitioning.forCompute(docs)
      .select(col(idCol).as("id"),
        TextFunctions.normalized(col(textCol)).as("__t"))
      // k-gram hashes, one per character position (short docs fall back
      // to a single whole-text gram via the greatest(...,1) floor)
      .select(col("id"), transform(
          sequence(lit(1), greatest(length(col("__t")) - (k - 1), lit(1))),
          i => hash(col("__t").substr(i, lit(k)))).as("__hs"))
      // window minima over materialized hashes; slice is clamped at the
      // array end so docs shorter than one window yield one global min
      .select(col("id"), array_distinct(transform(
          sequence(lit(0), greatest(size(col("__hs")) - w, lit(0))),
          j => array_min(slice(col("__hs"), j + 1, lit(w))))).as("fps"))
  }

  /** Production 64-bit fingerprint frame: xxhash64 gram domain with the
    * native O(len) monotonic-deque sliding minimum
    * ([[graft.plans.SlidingMinExpr]], codegen) replacing the O(len·w)
    * HOF window scan — the long-document scale path (at 10⁴-10⁵ grams
    * per document the HOF form is window-bound, not hash-bound). Same
    * winnowing semantics as `fingerprintFrame(hash = xxhash64)` —
    * WinnowingSpec pins the two bit-identical — with long keys that
    * shuffle ~5× smaller than md5 hex strings. The md5 [[fingerprintFrame]]
    * remains the SQL-oracle/cross-system-parity variant.
    */
  def fingerprintFrame64(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    Partitioning.forCompute(docs)
      .select(col(idCol).as("id"),
        TextFunctions.normalized(col(textCol)).as("__t"))
      .select(col("id"), transform(
          sequence(lit(1), greatest(length(col("__t")) - (k - 1), lit(1))),
          i => xxhash64(col("__t").substr(i, lit(k)))).as("__hs"))
      .select(col("id"), array_distinct(bridge.column(
          graft.plans.SlidingMinExpr(bridge.expression(col("__hs")), w)))
        .as("fps"))
  }

  /** Exploded inverted-index form: (id, fp), distinct per doc.
    *
    * The fps frame is cached before the explode as a PLAN BARRIER, not
    * (only) for reuse: InferFiltersFromGenerate synthesizes
    * `size(fps) > 0` for the explode and predicate pushdown substitutes
    * the alias chain all the way to the scan — without the barrier the
    * filter re-evaluates the ENTIRE winnowing pipeline per row as one
    * interpreted expression, with the gram array rebuilt per window
    * (measured 5.5 s/doc — O(len·w·len) — vs milliseconds). The trap
    * generalizes the lambda re-evaluation family: a generate above a
    * non-cheap HOF alias chain needs a materialization boundary.
    */
  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      hash: Column => Column = md5): DataFrame =
    fingerprintsManaged(docs, idCol, textCol, k, w, hash)._1

  /** [[fingerprints]] plus a release handle for the internal cache —
    * long-running callers (per-training-round decontamination, looped
    * dedup) must release after consuming or cached fingerprint frames
    * accumulate in storage memory across calls.
    */
  def fingerprintsManaged(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      hash: Column => Column = md5): (DataFrame, () => Unit) = {
    val frame = fingerprintFrame(docs, idCol, textCol, k, w, hash).cache()
    (frame.select(col("id"), explode(col("fps")).as("fp")),
      () => { frame.unpersist(); () })
  }

  /** Pairs sharing ≥ minShared fingerprints — the shared-passage
    * near-dup detector. Output (doc_a, doc_b, n_shared), doc_a < doc_b.
    * `maxDf > 0` drops fingerprints appearing in more than maxDf docs
    * from the pairing (corpus-boilerplate stopword dial; like
    * NGramJaccard's maxDf it changes the declared semantics, 0 = exact).
    */
  def sharedFingerprintPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxDf: Long = 0L,
      hash: Column => Column = md5): DataFrame =
    sharedFingerprintPairsManaged(docs, idCol, textCol, k, w, minShared,
      maxDf, hash)._1

  /** [[sharedFingerprintPairs]] plus a release handle for the two
    * internal caches (the fingerprint frame and the inverted index) —
    * looped callers (per-round decontamination sweeps) must release
    * after consuming or corpus-sized cached frames accumulate in
    * storage memory across calls.
    */
  def sharedFingerprintPairsManaged(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxDf: Long = 0L,
      hash: Column => Column = md5): (DataFrame, () => Unit) = {
    // cached: the inverted index feeds both join sides (self-join
    // recompute trap)
    val (fpIdx, releaseFps) =
      fingerprintsManaged(docs, idCol, textCol, k, w, hash)
    val fp0 = fpIdx.cache()
    val fp =
      if (maxDf > 0) {
        val hot = fp0.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("fp"))
        fp0.join(broadcast(hot), Seq("fp"), "left_anti")
      } else fp0
    val pairs = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    (pairs, () => { fp0.unpersist(); releaseFps(); () })
  }
}

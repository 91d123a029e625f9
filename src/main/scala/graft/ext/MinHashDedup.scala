package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Partitioning

/** MinHash + LSH near-duplicate detection (builder brief: the standard
  * shingle → minhash → band → bucket-join pipeline used for web-scale
  * training-data dedup).
  *
  * Signature scheme: each shingle string is hashed ONCE (xxhash64); the
  * k signature components re-hash that fixed-width value with k seeds.
  * String bytes are scanned once per shingle instead of k times — the
  * dominant cost at corpus scale — and the hash array is materialized
  * as a column so all k families share it.
  *
  * Scale design (100 TB): signatures are computed per-row inside the
  * scan stage (no shuffle); the only shuffles are (a) the band-bucket
  * self-join, partitioned on (band, bucket-hash) — uniform unless the
  * corpus contains huge exact-duplicate clusters, which should be
  * pre-collapsed by exact fingerprint dedup first — and (b) the
  * verification join back to shingle sets, partitioned on doc id.
  *
  * Parameter guidance: with k hashes in b bands of r = k/b rows, a pair
  * with Jaccard j becomes a candidate with probability 1-(1-j^r)^b —
  * pick (b, r) so the S-curve knee sits at the dedup threshold.
  * Defaults (k=64, b=32, r=2): P(candidate | j=0.5) ≈ 0.9999.
  */
object MinHashDedup {

  /** k-component MinHash signature from a pre-hashed shingle column
    * (array<long>): component i = min over shingle hashes h of
    * xxhash64(h, i) — re-hashing the fixed-width hash value, not the
    * string, so each of the k families costs O(1) per shingle while
    * staying genuinely independent. (An affine h·aᵢ+bᵢ family without a
    * wide modulus is order-correlated across i — every component picks
    * the same min shingle and LSH recall collapses; measured exactly
    * that before switching to re-hashing.)
    */
  def signatureFromHashes(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashes, h => xxhash64(h, i))))

  /** Banded LSH keys: array of (band index, hash of that signature slice). */
  def bandKeys(sig: Column, numBands: Int, k: Int): Column = {
    require(k % numBands == 0, s"k=$k must divide into numBands=$numBands")
    val r = k / numBands
    transform(
      sequence(lit(0), lit(numBands - 1)),
      j => struct(j.as("band"), xxhash64(slice(sig, j * r + 1, lit(r))).as("bh")))
  }

  /** (id, shingles, per-shingle hashes) projection — the shared head of
    * both the candidate and verification sides, parallelized before the
    * compute-heavy expressions.
    */
  private def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Shingling.shingleFrame(docs, idCol, textCol, n)
      .withColumn("hashes", transform(col("sh"), s => xxhash64(s)))

  /** Candidate near-duplicate pairs via banded LSH over word n-gram
    * shingles. Output: (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64,
      numBands: Int = 32): DataFrame =
    candidatesFrom(shingled(docs, idCol, textCol, n), k, numBands)

  private def candidatesFrom(sh: DataFrame, k: Int, numBands: Int): DataFrame = {
    // sig MUST be its own projection: bandKeys references it once per
    // band, so an inlined signature expression would be recomputed
    // numBands× per row (measured ~9× slowdown; far worse uncached,
    // where each re-evaluation also re-tokenizes).
    // cached: the self-join would otherwise recompute signatures once
    // per side.
    val sigd = sh.select(col("id"),
      signatureFromHashes(col("hashes"), k).as("sig"))
    val banded = sigd
      .select(col("id"), explode(bandKeys(col("sig"), numBands, k)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .cache()
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /** Full near-dup pipeline: LSH candidates verified by exact shingle-set
    * Jaccard ≥ threshold. Output: (doc_a, doc_b, jaccard).
    */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      k: Int = 64,
      numBands: Int = 32): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n).cache()
    val pairs = candidatesFrom(sh, k, numBands)
    val sets = sh.select(col("id"), col("sh"))
    pairs
      .join(sets.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(Shingling.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Persistable dedup index: one row per doc with its hashed shingle
    * set and MinHash signature — the structure a 100 TB corpus keeps as
    * a parquet/Delta table so each new batch deduplicates against the
    * corpus WITHOUT recomputing anything over old documents. Schema:
    * (id, hashes array<long>, sig array<long>).
    *
    * The SIGNATURE is stored, not the band keys: banding is a cheap
    * slice-hash over a materialized sig column at probe time, so the
    * index can be re-banded (tighter/looser S-curve) without
    * re-shingling — and storing sig keeps it multi-referenced in this
    * plan, which blocks the CollapseProject inlining that would
    * otherwise recompute the 64-min signature once per band inside a
    * single-reference lambda (measured 32× recompute, the
    * candidatesFrom trap in a new disguise).
    *
    * Verification carries the hashed shingle domain (collision-free in
    * practice, P ≈ |sh|²·2⁻⁶⁴ — same basis as NGramJaccard), so the
    * index is ~8 bytes per shingle instead of the string payload.
    */
  def indexFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64): DataFrame =
    shingled(docs, idCol, textCol, n)
      .select(col("id"), col("hashes"),
        signatureFromHashes(col("hashes"), k).as("sig"))

  /** Incremental near-dup detection: pairs (a, b) with exact hashed-
    * shingle Jaccard ≥ threshold where AT LEAST ONE side is from
    * `newDocs` — both new×corpus and new×new — against a pre-built
    * [[indexFrame]] of the existing corpus. Old×old pairs are never
    * re-examined: the candidate join probes only new-batch band keys,
    * so per-batch cost is O(|batch| + collisions), not O(|corpus|).
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * The production loop is: pairs = incrementalNearDuplicates(batch,
    * index); act on pairs; index = index ∪ indexFrame(batch).
    */
  def incrementalNearDuplicates(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      k: Int = 64,
      numBands: Int = 32): DataFrame =
    incrementalNearDuplicatesManaged(
      newDocs, index, idCol, textCol, threshold, n, k, numBands)._1

  /** [[incrementalNearDuplicates]] plus a release handle that
    * unpersists the internal caches — long-running callers (the
    * streaming ingest loop runs this once per micro-batch) MUST call it
    * after consuming the pairs, or dead cached index unions accumulate
    * in storage memory across batches.
    */
  def incrementalNearDuplicatesManaged(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      k: Int = 64,
      numBands: Int = 32): (DataFrame, () => Unit) = {
    // cached: each feeds band explosion AND verification; the caches
    // are also the plan barrier the explode needs (trap: an inferred
    // size()>0 generate filter would otherwise re-run the signature
    // pipeline per row — see Winnowing.fingerprints)
    // one row per id, resolved in two steps so `all`/`sets` never fan
    // out the verification joins (duplicate id rows would emit the same
    // pair 2-4×): (1) WITHIN the batch, collapse repeated ids (same doc
    // landing in two arrival files — no landed version exists yet, so
    // any copy is acceptable); (2) ACROSS batch-vs-index, the INDEXED
    // row wins deterministically (left_anti, not an arbitrary
    // dropDuplicates pick): if a re-delivery mutated the text, dedup
    // must be computed against the version that actually landed.
    val newIdx = indexFrame(newDocs, idCol, textCol, n, k)
      .dropDuplicates("id").cache()
    val all = index.unionByName(
      newIdx.join(index.select(col("id")), Seq("id"), "left_anti")).cache()
    // band keys computed at probe time over the cached sig attribute
    def banded(df: DataFrame) = df
      .select(col("id"), explode(bandKeys(col("sig"), numBands, k)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = banded(newIdx).as("a").join(banded(all).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"))
      .distinct()
    val sets = all.select(col("id"), col("hashes"))
    val pairs = cand
      .join(sets.select(col("id").as("doc_a"), col("hashes").as("sh_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("hashes").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(Shingling.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    (pairs, () => { newIdx.unpersist(); all.unpersist(); () })
  }

  /** Dedup: keep one canonical doc (min id) per near-dup pair, one hop
    * (full transitive closure needs an iterative connected-components
    * pass — out of scope for a single query; one hop removes the
    * dominant mass of near-dups).
    */
  def dropNearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    val toDrop = nearDuplicates(docs, idCol, textCol, threshold, n)
      .select(col("doc_b").as(idCol)).distinct()
    docs.join(toDrop, Seq(idCol), "left_anti")
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (builder brief: the standard
  * shingle → minhash → band → bucket-join pipeline used for web-scale
  * training-data dedup).
  *
  * Scale design (100 TB): signatures are computed per-row inside the scan
  * stage (no shuffle); the only shuffles are (a) the band-bucket self-join,
  * partitioned on (band, bucket-hash) — uniform unless the corpus contains
  * huge exact-duplicate clusters, in which case those buckets are
  * *genuinely* quadratic and should be pre-collapsed by exact dedup
  * (fingerprint groupBy) first — and (b) the verification join back to
  * shingle sets, partitioned on doc id.
  *
  * Parameter guidance: with k hashes in b bands of r = k/b rows, the
  * probability a pair with Jaccard j becomes a candidate is
  * 1-(1-j^r)^b — pick (b, r) so the S-curve knee sits at the dedup
  * threshold. Defaults (k=64, b=32, r=2) knee near j≈0.2 with
  * P(candidate | j=0.5) ≈ 0.9999.
  */
object MinHashDedup {

  /** k-permutation MinHash signature of a shingle-array column: the i-th
    * component is min over shingles of xxhash64(shingle, i) — i acts as
    * the seed of the i-th hash family member.
    */
  def signature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** Banded LSH keys: array of (band index, hash of that signature slice). */
  def bandKeys(sig: Column, numBands: Int, k: Int): Column = {
    require(k % numBands == 0, s"k=$k must divide into numBands=$numBands")
    val r = k / numBands
    transform(
      sequence(lit(0), lit(numBands - 1)),
      j => struct(j.as("band"), xxhash64(slice(sig, j * r + 1, lit(r))).as("bh")))
  }

  /** Candidate near-duplicate pairs via banded LSH over word n-gram
    * shingles. Output: (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64,
      numBands: Int = 32): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      Shingling.wordNGrams(col(textCol), n).as("sh"))
    val banded = sh
      .select(col("id"), explode(bandKeys(signature(col("sh"), k), numBands, k)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
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
    val sh = docs.select(
      col(idCol).as("id"),
      Shingling.wordNGrams(col(textCol), n).as("sh"))
    val pairs = candidatePairs(docs, idCol, textCol, n, k, numBands)
    pairs
      .join(sh.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(Shingling.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Dedup: keep one canonical doc (min id) per connected near-dup pair
    * group, single-link over one hop (full transitive closure needs an
    * iterative connected-components pass — deliberately out of scope for
    * a single query; one hop removes the dominant mass of near-dups).
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

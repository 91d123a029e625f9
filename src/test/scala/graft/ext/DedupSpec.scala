package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Near-dup operator semantics on synthetic docs + the sf0.001 corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words about spark engines here"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams; short-doc fallback") {
    val sh = docs.select(Shingling.wordNGrams($"text", 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).contains("the quick brown") && sh(0).length == 7)
    val short = Seq((9L, "tiny doc")).toDF("doc_id", "text")
      .select(Shingling.wordNGrams($"text", 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short == Seq("tiny doc"))
  }

  test("exact n-gram jaccard finds dup + near-dup, not the unrelated doc") {
    val pairs = NGramJaccard.allPairs(docs, "doc_id", "text", n = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 1.0)
  }

  test("minhash LSH pipeline matches exact pipeline on sf0.001 corpus") {
    val corpus = Tables.documents(spark, sf0001)
    val exact = NGramJaccard.allPairs(corpus, "doc_id", "text", n = 2, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashDedup.nearDuplicates(corpus, "doc_id", "text",
        threshold = 0.5, n = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // k=64/b=32/r=2 ⇒ miss prob ≤ 1e-4 per pair at j≥0.5
    assert(exact.nonEmpty)
  }

  test("simhash: exact dup hamming 0; near-dup close; unrelated far") {
    val sigs = SimHash.signatures(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    val pairs = SimHash.nearPairs(docs, "doc_id", "text", maxDist = 12, n = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("dropNearDuplicates keeps canonical min-id doc") {
    val kept = MinHashDedup.dropNearDuplicates(docs, "doc_id", "text",
      threshold = 0.4, n = 2).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2 and 4 dropped as dups of 1
  }

  test("incremental dedup tolerates duplicate ids within the batch (no pair fanout)") {
    val corpus = graft.core.Tables.documents(spark, sf0001)
    val isNew = org.apache.spark.sql.functions.col("doc_id") % 10 === 0
    val batchOnce = corpus.filter(isNew)
    val batchDup = batchOnce.unionByName(batchOnce) // same ids twice
    val idx = MinHashDedup.indexFrame(corpus.filter(!isNew), "doc_id", "text")
    def pairsOf(b: org.apache.spark.sql.DataFrame) =
      MinHashDedup.incrementalNearDuplicates(b, idx, "doc_id", "text", 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val clean = pairsOf(batchOnce)
    val dup = pairsOf(batchDup)
    assert(dup.size == dup.distinct.size, s"fanned-out pairs: $dup")
    assert(dup.toSet == clean.toSet)
  }

  test("incremental dedup == full pipeline restricted to batch-touching pairs (sf0.001)") {
    val corpus = graft.core.Tables.documents(spark, sf0001)
    val isNew = org.apache.spark.sql.functions.col("doc_id") % 10 === 0
    val full = MinHashDedup.nearDuplicates(corpus, "doc_id", "text",
        threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val inc = MinHashDedup.incrementalNearDuplicates(
        corpus.filter(isNew),
        MinHashDedup.indexFrame(corpus.filter(!isNew), "doc_id", "text"),
        "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(inc == expected,
      s"missing=${expected -- inc} extra=${inc -- expected}")
    assert(expected.nonEmpty, "fixture should contain batch-touching near-dups")
  }
}

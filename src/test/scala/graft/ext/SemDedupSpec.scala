package graft.ext

import graft.SparkSpec
import graft.core.Tables

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted identical vectors pair up within their cluster") {
    val base = (1L to 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat))
    }
    // 41 duplicates 1 exactly: cosine 1.0, same cluster by construction
    val emb = (base :+ (41L, base.head._2)).toDF("vec_id", "embedding")
    val pairs = SemDedup.pairs(emb, threshold = 0.999, nCells = 4, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 41L && p._3 == 1.0),
      s"identical pair not found: ${pairs.toSeq}")
  }

  test("zero-norm embeddings are dropped, not crashed on (even as seed candidates)") {
    val base = (1L to 20L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat))
    }
    val emb = (base ++ Seq((98L, Array.fill(8)(0f)), (99L, base.head._2)))
      .toDF("vec_id", "embedding")
    val pairs = SemDedup.pairs(emb, threshold = 0.999, nCells = 4, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 99L)) // real dup still found
    assert(!pairs.exists(p => p._1 == 98L || p._2 == 98L),
      "zero-norm vector has no direction and must pair with nothing")
  }

  test("subset of exact answer + recall floor on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val brute = SimilaritySearch.cosineNearDuplicates(emb, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val sem = SemDedup.pairs(emb, 0.4, nCells = 16, iters = 2, nAssign = 3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert((sem -- brute).isEmpty, s"fabricated pairs: ${sem -- brute}")
    val recall = (sem & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall $recall below floor (measured 0.909)")
  }

  test("deterministic: two runs produce identical pair sets") {
    val emb = Tables.embeddings(spark, sf0001)
    def run() = SemDedup.pairs(emb, 0.4, nCells = 8, iters = 2, nAssign = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("nAssign=1 finds strictly fewer-or-equal pairs than nAssign=2 (still a subset)") {
    val emb = Tables.embeddings(spark, sf0001)
    def run(na: Int) = SemDedup.pairs(emb, 0.4, nCells = 8, iters = 2, nAssign = na)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val hard = run(1)
    val soft = run(2)
    assert(hard.subsetOf(soft),
      "hard assignment must not find pairs soft assignment misses")
    assert(soft.size >= hard.size)
  }

  test("pairsManaged releases the internal normalized-corpus cache") {
    // clearCache drops same-suite leaked caches (CacheManager dedups an
    // identical plan, so no NEW rdd id would appear); the snapshot
    // covers other suites' localCheckpoint RDDs, which survive it
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = SemDedup.pairsManaged(
      Tables.embeddings(spark, sf0001), threshold = 0.4, nCells = 8,
      iters = 1, nAssign = 2)
    assert(out.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}

package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  test("cosine on hand-computed vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0.6f, 0.8f, 0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine($"a", $"b").as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(c - 0.6) < 1e-6)
    val n = df.select(VectorFunctions.norm($"b").as("n")).collect().head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("bruteForceTopK: identical vector ranks first") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.001f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val top = SimilaritySearch.bruteForceTopK(emb, emb.filter($"vec_id" === 1), k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("cand_id")).toSeq == Seq(2L, 3L))
  }

  test("lshTopK recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val exact = SimilaritySearch.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.lshTopK(emb, queries, k = 5, dim = 64,
        tables = 16, bits = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random data, no cluster structure: sign-LSH still concentrates —
    // demand clearly-above-chance recall (chance ≈ k/N = 10%)
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("ivfTopK recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val exact = SimilaritySearch.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.ivfTopK(emb, queries, k = 5, dim = 64,
        nCells = 8, nProbe = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // nProbe/nCells = half the corpus scanned ⇒ expected recall ≈ 0.5
    // on clusterless data; demand clearly above the k/N ≈ 10% chance
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("incremental cosine near-dup == full pipeline restricted to batch-touching pairs") {
    val emb = Tables.embeddings(spark, sf0001)
    val isNew = $"vec_id" % 10 === 0
    val full = SimilaritySearch.cosineNearDuplicates(emb, threshold = 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val inc = SimilaritySearch.incrementalCosineNearDuplicates(
        emb.filter(isNew), emb.filter(!isNew), threshold = 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(inc == expected, s"missing=${expected -- inc} extra=${inc -- expected}")
  }

  test("incrementalCosineNearDuplicatesManaged releases its internal cache") {
    // clearCache drops same-suite leaked caches (CacheManager dedups an
    // identical plan, so no NEW rdd id would appear for the managed
    // call); the before-snapshot covers other suites' localCheckpoint
    // RDDs, which survive clearCache — assert on the DELTA
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val emb = Tables.embeddings(spark, sf0001)
    val isNew = $"vec_id" % 10 === 0
    val (pairs, release) = SimilaritySearch.incrementalCosineNearDuplicatesManaged(
      emb.filter(isNew), emb.filter(!isNew), threshold = 0.4)
    assert(pairs.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "cache should be live while the caller consumes the pairs")
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "release handle must unpersist the internal batch cache")
  }

  test("ivfTopK bulk-probe path: shuffle join past broadcast threshold, same answer") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val broadcastPlan = SimilaritySearch.ivfTopK(emb, queries, k = 5, dim = 64,
      nCells = 8, nProbe = 4)
    val expected = broadcastPlan.collect().map(_.toSeq).toSet
    // Drop the session broadcast threshold so the probe-size guard must
    // route the very same query set through the shuffle-join path —
    // results must be identical (the guard changes strategy, not
    // semantics).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val bulk = SimilaritySearch.ivfTopK(emb, queries, k = 5, dim = 64,
        nCells = 8, nProbe = 4)
      val plan = bulk.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"expected shuffle join under tiny broadcast threshold:\n$plan")
      assert(bulk.collect().map(_.toSeq).toSet == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("hardNegatives: below-ceiling top-k, contiguous ranks, agrees with filtered brute force") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val hn = SimilaritySearch.hardNegatives(emb, queries, k = 5, maxCos = 0.8)
      .collect()
    assert(hn.nonEmpty)
    // every row respects the ceiling; ranks are 1..n per query
    assert(hn.forall(_.getAs[Double]("cos_sim") < 0.8))
    for ((_, rows) <- hn.groupBy(_.getAs[Long]("query_id")))
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    // equals brute-force top-k restricted to the ceiling: take a large
    // brute k, drop >= ceiling rows, re-rank, truncate to 5
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, k = 1000)
      .collect()
      .filter(_.getAs[Double]("cos_sim") < 0.8)
      .groupBy(_.getAs[Long]("query_id"))
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (-r.getAs[Double]("cos_sim"), r.getAs[Long]("cand_id")))
          .take(5).zipWithIndex
          .map { case (r, i) =>
            (q, r.getAs[Long]("cand_id"), r.getAs[Double]("cos_sim"), i + 1)
          }.toSeq
      }.toSet
    val got = hn.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
      r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))).toSet
    assert(got == brute)
  }
}

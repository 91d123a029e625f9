package graft.ext

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed tf-idf ranking: rare repeated terms outrank ubiquitous ones") {
    // 4 docs; "common" appears in all (df=4, idf-ratio 1), "rare" only
    // in doc 1 (df=1, idf-ratio 4) — doc 1's top term must be "rare"
    // even though "common" has higher tf there.
    val docs = Seq(
      1L -> "common common common rare",
      2L -> "common alpha",
      3L -> "common beta",
      4L -> "common gamma").toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._6) -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: rare tf=1 df=1 → 1·(4/1)=4.0; common tf=3 df=4 → 3.0
    assert(top((1L, 1)) == (("rare", 1L, 1L, 4.0)))
    assert(top((1L, 2)) == (("common", 3L, 4L, 3.0)))
    // doc 2: alpha tf=1 df=1 → 4.0 beats common 1.0
    assert(top((2L, 1)) == (("alpha", 1L, 1L, 4.0)))
    assert(top((2L, 2)) == (("common", 1L, 4L, 1.0)))
  }

  test("tie order is deterministic: equal scores break by term ascending") {
    val docs = Seq(1L -> "zeta eta", 2L -> "theta").toDF("doc_id", "text")
    // doc 1: zeta and eta both tf=1 df=1 → score 2.0 each
    val r = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(r == Seq("eta", "zeta"))
  }

  test("normalization and empty docs: case folds, empty text yields no terms") {
    val docs = Seq(1L -> "Word WORD word", 2L -> "", 3L -> "   ").toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 3)
    val rows = out.as[(Long, String, Long, Long, Double, Int)].collect()
    assert(rows.map(_._1).toSet == Set(1L)) // empty docs emit nothing
    assert(rows.head._2 == "word" && rows.head._3 == 3L) // folded tf=3
    // N counts ALL documents (including empty ones): df=1, N=3 → 3·3=9
    assert(rows.head._5 == 9.0)
  }

  test("topTermsManaged releases the internal caches") {
    // parquet-backed input (a tiny Seq folds to a LocalRelation whose
    // cache never materializes — trap #8 — making release untestable);
    // delta assertions because sibling suites' localCheckpoint RDDs
    // survive clearCache
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = TfIdf.topTermsManaged(
      graft.core.Tables.documents(spark, sf0001), "doc_id", "text", k = 1)
    assert(out.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "caches should be live while the caller consumes the result")
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}

package graft.ext

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("hand-computed BM25: idf rewards rare terms, length normalization penalizes long docs") {
    // 4 docs, query {rare, common}. "common" in all 4 (df=4), "rare"
    // only in docs 1 and 2 (df=2). N=4, dl = (4, 2, 2, 2), avgdl=2.5.
    val docs = Seq(
      1L -> "rare common filler filler",
      2L -> "rare common",
      3L -> "common x",
      4L -> "common y").toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("rare", "common"), k = 4)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def score(tf: Long, df: Long, dl: Long): Double = {
      val idf = (4.0 - df + 0.5) / (df + 0.5)
      val sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.5)))
      BigDecimal(idf * sat).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    // doc 2 (short, both terms) must outrank doc 1 (same terms, longer)
    val s1 = score(1, 2, 4) + score(1, 4, 4)
    val s2 = score(1, 2, 2) + score(1, 4, 2)
    assert(s2 > s1)
    assert(out(2L) == ((2L, s2, 1L)))
    assert(out(1L) == ((2L, s1, 2L)))
    // docs 3/4: same single-term score, tie broken by doc_id
    assert(out(3L)._2 == out(4L)._2)
    assert(out(3L)._1 == 1L && out(3L)._3 == 3L && out(4L)._3 == 4L)
  }

  test("k caps the result and ranks are contiguous from 1") {
    val docs = Seq(
      1L -> "a b", 2L -> "a", 3L -> "a c", 4L -> "b c").toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("a"), k = 2)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect()
    assert(r.length == 2 && r.map(_._4).toSeq == Seq(1L, 2L))
  }

  test("documents with no query term are absent; empty corpus-term overlap yields empty frame") {
    val docs = Seq(1L -> "x y", 2L -> "y z").toDF("doc_id", "text")
    assert(Bm25.topK(docs, "doc_id", "text", Seq("absent"), k = 5).count() == 0)
    val hit = Bm25.topK(docs, "doc_id", "text", Seq("x"), k = 5)
      .as[(Long, Long, Double, Long)].collect()
    assert(hit.map(_._1).toSeq == Seq(1L))
  }

  test("topKManaged releases the internal tokenization cache") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = Bm25.topKManaged(
      graft.core.Tables.documents(spark, sf0001), "doc_id", "text",
      Seq("spark", "hash"), k = 5)
    assert(out.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}

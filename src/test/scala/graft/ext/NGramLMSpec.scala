package graft.ext

import graft.SparkSpec

class NGramLMSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]) =
    NGramLM.scoreDocs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-computed smoothed bigram probabilities") {
    // corpus: "a b" ×2 and "a c" ×1 → c(a,b)=2, c(a,c)=1, c(a)=3,
    // V = {a,b,c} = 3, α=0.5:
    //   P(b|a) = (2+0.5)/(3+1.5) = 2.5/4.5 = 0.555556 (rounded)
    //   P(c|a) = (1+0.5)/(3+1.5) = 1.5/4.5 = 0.333333
    val m = score(Seq(1L -> "a b", 2L -> "a b", 3L -> "a c"))
    assert(m(1L) == ((1L, Some(0.555556))))
    assert(m(2L) == ((1L, Some(0.555556))))
    assert(m(3L) == ((1L, Some(0.333333))))
  }

  test("corpus-typical transitions outscore gibberish") {
    val prose = (1L to 8L).map(i => i -> "the cat sat on the mat")
    val docs = prose :+ (9L -> "mat the on sat cat zzz")
    val m = score(docs)
    val typical = m(1L)._2.get
    val odd = m(9L)._2.get
    assert(typical > odd,
      s"corpus-typical $typical should outscore reversed/gibberish $odd")
  }

  test("docs without bigrams score null, zero bigram count") {
    val m = score(Seq(1L -> "a b", 2L -> "solo", 3L -> ""))
    assert(m(2L) == ((0L, None)))
    assert(m(3L) == ((0L, None)))
    assert(m(1L)._1 == 1L)
  }

  test("scoreDocsManaged releases the internal bigram-count cache") {
    spark.catalog.clearCache()
    // parquet-backed input: a tiny in-memory Seq folds to a LocalRelation
    // whose cache never materializes an RDD (trap #8), making the
    // release assertion vacuous
    // delta-based: sibling suites' localCheckpoint RDDs survive the
    // clearCache above
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = NGramLM.scoreDocsManaged(
      graft.core.Tables.documents(spark, sf0001), "doc_id", "text")
    // reference a right-side column: a bare count() lets the optimizer
    // eliminate the outer join (unique keys, no columns referenced) and
    // the cache would never materialize
    assert(out.filter($"avg_prob".isNotNull).count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}

package graft.ext

import graft.SparkSpec

class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    RepetitionStats.stats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-computed repetition fractions") {
    val m = run(Seq(
      // bigrams: "a b"×3, "b a"×2 → topc 3, frac 3·2/6 = 1.0;
      // trigrams: "a b a"×2, "b a b"×2 → 4 total, 2 distinct → 0.5
      1L -> "a b a b a b",
      // all grams unique: topc 1 → 2/4 = 0.5; dup trigram 0.0
      2L -> "one two three four",
      // single token: no grams at all
      3L -> "hello",
      // repetition is measured on NORMALIZED text (case/whitespace):
      // "the the the the" → top bigram ×3 → least(6/4, 1) capped at 1.0;
      // trigram "the the the"×2 → dup 0.5
      4L -> "The  the   THE the"))
    assert(m(1L) == ((6L, 1.0, 0.5)))
    assert(m(2L) == ((4L, 0.5, 0.0)))
    assert(m(3L) == ((1L, 0.0, 0.0)))
    assert(m(4L) == ((4L, 1.0, 0.5)))
  }

  test("empty and whitespace-only docs yield zeros, not nulls or errors") {
    val m = run(Seq(1L -> "", 2L -> "   \t  "))
    assert(m(1L) == ((0L, 0.0, 0.0)))
    assert(m(2L) == ((0L, 0.0, 0.0)))
  }

  test("statsManaged releases the internal gram cache") {
    // parquet-backed input (trap #8: a tiny Seq folds to a LocalRelation
    // whose cache never materializes, making release untestable); delta
    // assertions because sibling suites' localCheckpoint RDDs survive
    // clearCache
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = RepetitionStats.statsManaged(
      graft.core.Tables.documents(spark, sf0001), "doc_id", "text")
    assert(out.count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "gram cache should be live while the caller consumes the result")
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
  }
}

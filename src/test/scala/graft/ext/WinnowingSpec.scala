package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  private val w = 4

  private def fpSets(docs: Seq[(Long, String)],
      hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column = md5) =
    Winnowing.fingerprintFrame(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, w, hash)
      .as[(Long, Seq[String])].collect().toMap
      .map { case (id, fps) => id -> fps.toSet }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    // random distinct prefix/suffix, one planted common passage of
    // exactly w+k-1 chars — the minimal guaranteed-detectable match
    val passage = "xqzvjwkp" // exactly w+k-1 = 8 chars
    assert(passage.length == w + k - 1)
    // prefix from letters, suffix from digits: no accidental shared
    // 5-gram outside the planted passage
    val g = for {
      a <- Gen.listOfN(40, Gen.oneOf('a' to 'm')).map(_.mkString)
      b <- Gen.listOfN(40, Gen.numChar).map(_.mkString)
    } yield (a, b)
    (0 until 10).foreach { i =>
      val (a, b) = g.apply(Gen.Parameters.default, Seed(31L + i)).get
      val sets = fpSets(Seq(1L -> s"$a $passage", 2L -> s"$passage $b"))
      assert((sets(1L) & sets(2L)).nonEmpty,
        s"no shared fingerprint for planted passage (seed $i)")
    }
  }

  test("fingerprint density ~ 2/(w+1) of grams; disjoint docs don't collide") {
    // disjoint character alphabets (letters vs digits): no 5-char run
    // can match across the two texts
    val doc = "the quick brown fox jumps over the lazy dog again and again more"
    val other = "0123456789 9876543210 1122334455 5544332211 6677889900 0099887766"
    val sets = fpSets(Seq(1L -> doc, 2L -> other))
    val grams = doc.length - k + 1
    assert(sets(1L).size < grams / 2, "winnowing must compress the gram set")
    assert((sets(1L) & sets(2L)).isEmpty, "disjoint texts share no fingerprint")
  }

  test("short documents (below k and below one window) still fingerprint") {
    val sets = fpSets(Seq(1L -> "ab", 2L -> "abcdef", 3L -> "ab"))
    assert(sets(1L).size == 1)    // whole-text fallback gram
    assert(sets(1L) == sets(3L))  // deterministic
    assert(sets(2L).nonEmpty && sets(2L).size <= 2)
  }

  test("xxhash64 production variant preserves the guarantee and the pair semantics") {
    val base = "the common long passage that both documents quote verbatim here"
    val docs = Seq(
      1L -> s"unrelated preamble alpha beta gamma $base",
      2L -> s"$base totally different trailing content omega",
      3L -> "zq zq zq vkx vkx wpj wpj 12345 67890") // no 5-gram overlap
    val pairs = Winnowing.sharedFingerprintPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", k, w, minShared = 1, hash = c => xxhash64(c))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("decontaminate drops corpus docs quoting eval passages, keeps clean ones") {
    val evalQ = "what is the airspeed velocity of an unladen swallow in still air"
    val evalSet = Seq(100L -> evalQ).toDF("doc_id", "text")
    val corpus = Seq(
      // quotes the eval question inside a longer page → contaminated
      1L -> s"forum thread about coconuts and birds $evalQ someone asked yesterday",
      // clean doc, disjoint content
      2L -> "a completely unrelated discussion of parquet row group statistics",
      // partially overlapping words but no long verbatim passage
      3L -> "airspeed statistics of various swallow species differ in still weather"
    ).toDF("doc_id", "text")
    val flagged = Contamination.flagged(corpus, evalSet, "doc_id", "text",
        k = 10, w = 4, minShared = 2)
      .select("corpus_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((1L, 100L)), s"flagged=$flagged")
    val kept = Contamination.decontaminate(corpus, evalSet, "doc_id", "text",
        k = 10, w = 4, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("sharedFingerprintPairsManaged releases both internal caches") {
    // parquet-backed input (trap #8: a tiny Seq folds to a LocalRelation
    // whose cache never materializes, making release untestable); delta
    // assertions because sibling suites' localCheckpoint RDDs survive
    // clearCache
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (pairs, release) = Winnowing.sharedFingerprintPairsManaged(
      graft.core.Tables.documents(spark, sf0001), "doc_id", "text",
      k = 20, w = 10, minShared = 4)
    assert(pairs.count() > 0) // the fixture's planted near-dups share passages
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "caches should be live while the caller consumes the pairs")
    release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "release handle must unpersist the fingerprint frame AND the inverted index")
  }

  test("maxDf drops corpus-boilerplate fingerprints from pairing") {
    // the same passage in ALL docs is boilerplate; with maxDf=2 it stops
    // linking documents
    val boiler = "standard legal disclaimer attached to every document"
    val docs = (1L to 4L).map(i => i -> s"unique body $i${"x" * i.toInt} $boiler")
    val all = Winnowing.sharedFingerprintPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", k, w, minShared = 1).count()
    val capped = Winnowing.sharedFingerprintPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", k, w, minShared = 1, maxDf = 2).count()
    assert(all >= 6, s"boilerplate should link all pairs, got $all")
    assert(capped < all)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "kitten", "b1"), (2L, "sitting", "b1"), (3L, "kitten!", "b1"),
    (4L, "kitten", "b2"), // same text, different block — never paired
    (5L, "completely different", "b1"))

  private def run(maxDist: Int) =
    EntityResolution.blockedEditDistancePairs(
      rows.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("hand-checked distances within blocks; bound excludes far pairs") {
    // kitten↔sitting = 3, kitten↔kitten! = 1, sitting↔kitten! = 3
    assert(run(3) == Set((1L, 2L, 3), (1L, 3L, 1), (2L, 3L, 3)))
    // tighter bound cuts the distance-3 pairs, keeps the typo pair
    assert(run(2) == Set((1L, 3L, 1)))
  }

  test("blocking: cross-block pairs never compared; each pair once, id_a < id_b") {
    val out = run(10)
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    out.foreach(p => assert(p._1 < p._2))
    assert(out.map(p => (p._1, p._2)).size == out.size)
  }

  test("length-filter blocking loses nothing vs brute force on random strings") {
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val rng = new scala.util.Random(7)
    val data = (1L to 120L).map(i =>
      (i, rng.alphanumeric.take(2 + rng.nextInt(14)).mkString, s"b${i % 3}"))
    val expected = (for {
      x <- data; y <- data
      if x._3 == y._3 && x._1 < y._1
      d = lev(x._2, y._2) if d <= 4
    } yield (x._1, y._1, d)).toSet
    val got = EntityResolution.blockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("identical strings at distance 0; maxDist 0 finds exact dupes only") {
    val dupes = Seq((1L, "same", "b"), (2L, "same", "b"), (3L, "off", "b"))
    val out = EntityResolution.blockedEditDistancePairs(
      dupes.toDF("id", "name", "blk"), "id", "name", col("blk"), 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }

  private def lev(x: String, y: String): Int = {
    val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  // one hot block, lengths spread 1..60 — the shape that graduates to
  // the composite (block, length-bucket) key at scale
  private val hotBlock: Seq[(Long, String, String)] = {
    val rng = new scala.util.Random(11)
    (1L to 150L).map(i =>
      (i, rng.alphanumeric.take(1 + rng.nextInt(60)).mkString, "hot"))
  }

  private def brute(data: Seq[(Long, String, String)], maxDist: Int) =
    (for {
      x <- data; y <- data
      if x._3 == y._3 && x._1 < y._1
      d = lev(x._2, y._2) if d <= maxDist
    } yield (x._1, y._1, d)).toSet

  test("forced length-bucket path (smallBlockLimit=0) loses nothing vs brute force") {
    val got = EntityResolution.blockedEditDistancePairs(
      hotBlock.toDF("id", "name", "blk"), "id", "name", col("blk"), 3,
      smallBlockLimit = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(hotBlock, 3))
  }

  test("adaptive dispatch: mixed small/large blocks, both legs exact, no dup/loss") {
    val rng = new scala.util.Random(13)
    val smallBlk = (200L to 219L).map(i =>
      (i, rng.alphanumeric.take(1 + rng.nextInt(40)).mkString, "cold"))
    val data = hotBlock ++ smallBlk
    // limit 50: "hot" (150 rows) takes the bucketed leg, "cold" (20) the simple one
    val got = EntityResolution.blockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), 3,
      smallBlockLimit = 50)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(data, 3))
  }

  test("composite key caps the verify volume: hot-block candidates well under n²/2") {
    val n = hotBlock.size.toLong
    val allPairs = n * (n - 1) / 2
    val candidates = EntityResolution.candidatePairs(
      hotBlock.toDF("id", "name", "blk"), "id", "name", col("blk"), 3,
      smallBlockLimit = 0).count()
    // width-4 buckets over lengths 1..60 → ~15 cells; each row only meets
    // its own + adjacent cells. Pin ≤ 25% of the quadratic volume (measured
    // ~19%) — the regression this guards is the key silently coarsening.
    assert(candidates <= allPairs / 4,
      s"hot-block candidates $candidates vs all-pairs $allPairs")
    // and the verify still finds exactly the brute-force pairs
  }

  // ── opt-in approximate escape for the documented residual: a hot
  // block whose members all share ONE length bucket (same-length SKUs)
  // defeats the exact dispatch; the SimHash escape bounds candidates by
  // signature-chunk density instead. Precision must stay 1 (identical
  // verify → subset of brute force); recall is approximate and MEASURED
  // here, not assumed.
  private val sameLenHot: (Seq[(Long, String, String)], Set[(Long, Long)]) = {
    val rng = new scala.util.Random(17)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val bases = (1L to 150L).map(i =>
      (i, Seq.fill(24)(alpha(rng.nextInt(alpha.length))).mkString, "hot"))
    // 50 planted near-dups: two substitutions (ED = 2), SAME length
    val dups = bases.take(50).map { case (i, s, b) =>
      val cs = s.toCharArray
      cs(3) = if (cs(3) == 'x') 'y' else 'x'
      cs(17) = if (cs(17) == 'p') 'q' else 'p'
      (i + 1000L, new String(cs), b)
    }
    (bases ++ dups, bases.take(50).map(r => (r._1, r._1 + 1000L)).toSet)
  }

  test("approx escape: precision 1 (subset of brute), recall measured ≥ 0.9 on planted same-length hot block") {
    val (data, planted) = sameLenHot
    val exact = brute(data, 3)
    assert(planted.forall(p => exact.exists(e => (e._1, e._2) == p)))
    val got = EntityResolution.approxBlockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    // subset: the verify is the same banded levenshtein, so any pair the
    // escape emits must be a true pair with the true distance
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact)}")
    val recall = got.size.toDouble / exact.size
    info(f"approx escape recall: ${got.size}/${exact.size} = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f under the measured floor")
  }

  test("approx escape: same-length block joins on signature chunks, never all-pairs") {
    val (data, _) = sameLenHot
    val p = EntityResolution.approxBlockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the composite chunk key must be part of the join, not a post-filter
    assert(p.contains("__chunk") && p.contains("__ck"), p)
  }

  // ── exact escape: PassJoin-style segment blocking must equal brute
  // force on every fixture (it is an exactness claim, not a recall one)
  test("segment blocking: exact vs brute force on random mixed-length strings") {
    val rng = new scala.util.Random(23)
    // lengths 0..30 INCLUDING the short-leg range (< maxDist+1)
    val data = (1L to 140L).map(i =>
      (i, rng.alphanumeric.take(rng.nextInt(31)).mkString, s"b${i % 2}"))
    for (maxDist <- Seq(0, 1, 3)) {
      val got = EntityResolution.segmentBlockedEditDistancePairs(
        data.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(data, maxDist), s"maxDist=$maxDist")
    }
  }

  test("segment blocking: exact on the planted same-length hot block (the residual case)") {
    val (data, _) = sameLenHot
    val got = EntityResolution.segmentBlockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(data, 3)) // recall 1 by construction, not by luck
  }

  test("segment blocking: candidates scale with collisions, not block² — and it's an equi-join") {
    val (data, _) = sameLenHot
    val df = data.toDF("id", "name", "blk")
    val q = EntityResolution.segmentBlockedEditDistancePairs(
      df, "id", "name", col("blk"), maxDist = 3)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // random same-length 24-char strings share almost no exact segments:
    // the verify volume must sit FAR under the 200·199/2 pair count the
    // single length bucket would force (50 planted pairs + collisions)
    val verified = q.count()
    val exact = brute(data, 3).size
    assert(verified == exact)
  }

  test("legacy mode (smallBlockLimit=Int.MaxValue) matches adaptive default") {
    val adaptive = EntityResolution.blockedEditDistancePairs(
      hotBlock.toDF("id", "name", "blk"), "id", "name", col("blk"), 4,
      smallBlockLimit = 50)
      .as[(Long, Long, Int)].collect().toSet
    val legacy = EntityResolution.blockedEditDistancePairs(
      hotBlock.toDF("id", "name", "blk"), "id", "name", col("blk"), 4,
      smallBlockLimit = Int.MaxValue)
      .as[(Long, Long, Int)].collect().toSet
    assert(adaptive == legacy)
  }
}

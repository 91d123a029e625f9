package graft.ext

import graft.SparkSpec

/** Pins the unigram-LM tokenizer: forward-backward correctness
  * against hand-enumerable lattices, Viterbi optimality vs brute
  * force, bit-deterministic training, EM's monotone-likelihood law,
  * and the full-corpus roundtrip/coverage contract.
  */
class UnigramLmSpec extends SparkSpec {

  import UnigramLm._

  test("expectations: hand-checkable two-segmentation lattice") {
    import scala.collection.mutable
    // "ab" with vocab {a, b, ab}: segmentations [ab] and [a,b].
    // p(a)=p(b)=0.25, p(ab)=0.5 → P([ab]) = .5, P([a,b]) = .0625
    val logp = mutable.Map(
      "a" -> math.log(0.25), "b" -> math.log(0.25), "ab" -> math.log(0.5))
    val (e, z) = expectations("ab", logp, 4, -1e9)
    val pAll = 0.5 + 0.0625
    assert(math.abs(math.exp(z) - pAll) < 1e-12)
    // E[ab] = .5/.5625, E[a] = E[b] = .0625/.5625
    assert(math.abs(e("ab") - 0.5 / pAll) < 1e-12)
    assert(math.abs(e("a") - 0.0625 / pAll) < 1e-12)
    assert(math.abs(e("b") - 0.0625 / pAll) < 1e-12)
  }

  test("viterbi matches brute-force best segmentation on every word of a fixture") {
    val logp = Map("a" -> -2.0, "b" -> -2.5, "ab" -> -1.2, "ba" -> -3.0,
      "aba" -> -2.9, "bb" -> -2.2, "c" -> -4.0)
    def brute(word: String): Double = {
      if (word.isEmpty) return 0.0
      (1 to math.min(word.length, 6)).flatMap { k =>
        logp.get(word.take(k)).map(_ + brute(word.drop(k)))
          .filter(_ > Double.NegativeInfinity)
      }.foldLeft(Double.NegativeInfinity)(math.max)
    }
    for (w <- Seq("abab", "aababb", "abba", "cab", "bbaba", "a")) {
      val pieces = viterbi(w, logp, 6)
      assert(pieces.mkString("") === w, s"roundtrip $w")
      val score = pieces.map(p => logp.getOrElse(p, -1e9)).sum
      assert(math.abs(score - brute(w)) < 1e-12, s"optimality on $w")
    }
  }

  test("viterbi: unknown characters segment as themselves without poisoning neighbors") {
    val logp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -0.5)
    assert(viterbi("axb", logp, 4) === Seq("a", "x", "b"))
    assert(viterbi("abxab", logp, 4) === Seq("ab", "x", "ab"))
  }

  test("training is bit-deterministic across partitionings") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = train(docs.repartition(3), "text", vocabSize = 150,
      maxPieceLen = 5, seedSize = 400, emIters = 2, postPruneIters = 1)
    val b = train(docs.repartition(17), "text", vocabSize = 150,
      maxPieceLen = 5, seedSize = 400, emIters = 2, postPruneIters = 1)
    assert(a.pieces === b.pieces) // exact logp equality, piece for piece
    assert(a.loglikTrace === b.loglikTrace)
  }

  test("EM raises likelihood within each phase; prune keeps chars; roundtrip holds corpus-wide") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val t = train(docs, "text", vocabSize = 200, maxPieceLen = 5,
      seedSize = 500, emIters = 3, postPruneIters = 2)
    val (phase1, phase2) = t.loglikTrace.splitAt(3)
    for (Seq(x, y) <- phase1.sliding(2)) assert(y >= x - 1e-3, s"phase1 $x -> $y")
    for (Seq(x, y) <- phase2.sliding(2)) assert(y >= x - 1e-3, s"phase2 $x -> $y")
    val chars = t.pieces.count(_.piece.length == 1)
    assert(chars >= 20) // the corpus alphabet survived pruning
    assert(t.pieces.size <= math.max(200, chars))
    // multi-char pieces were actually learned (the tokenizer compresses)
    assert(t.pieces.exists(_.piece.length > 1))
    val viol = violations(docs, "text", vocabSize = 200, maxPieceLen = 5,
      seedSize = 500, emIters = 2, postPruneIters = 1)
    assert(viol.count() === 0L)
  }
}

package graft.ext

import graft.SparkSpec
import graft.core.Tables

/** Pins the WordPiece tokenizer: hand-derivable likelihood-scored
  * training (including score ties broken by symbol order), the greedy
  * longest-match encoding laws (longest-match beats merge-order, UNK
  * on out-of-alphabet starts), bit-deterministic training across
  * partitionings, and the zero-row invariant gate on the fixture
  * corpus.
  */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  // hand-derived fixture: words {ab×10, abc×5}
  //   round 1: score(a,##b) = 15/(15·15) = score(##b,##c) = 5/(15·5);
  //            tie → (##b,##c) by symbol order → ##bc
  //   round 2: score(a,##b) = 10/(15·10) = score(a,##bc) = 5/(15·5);
  //            tie → (a,##b) → ab
  private def fixture() =
    Seq(("ab", 10L), ("abc", 5L)).toDF("word", "freq")

  test("training follows the likelihood argmax with deterministic ties") {
    val m = WordPiece.trainFromWords(fixture(), nMerges = 2)
    assert(m.merges === Seq(("##b", "##c"), ("a", "##b")))
    assert(m.vocab === Set("a", "##b", "##c", "##bc", "ab"))
    assert(m.maxPieceLen === 2)
  }

  test("greedy longest-match: beats merge order, identity on vocab words, UNK") {
    val m = WordPiece.trainFromWords(fixture(), nMerges = 2)
    // merge application would give [a, ##bc]; longest-match takes ab
    assert(WordPiece.encodeWord("abc", m.vocab, m.maxPieceLen) ===
      Seq("ab", "##c"))
    assert(WordPiece.encodeWord("ab", m.vocab, m.maxPieceLen) === Seq("ab"))
    assert(WordPiece.encodeWord("ac", m.vocab, m.maxPieceLen) ===
      Seq("a", "##c"))
    // 'b' exists only in ##-form: word-initial b has no match → UNK
    assert(WordPiece.encodeWord("ba", m.vocab, m.maxPieceLen) ===
      Seq("[UNK]"))
    assert(WordPiece.encodeWord("", m.vocab, m.maxPieceLen) === Nil)
  }

  test("training is deterministic across partitionings") {
    val words = Bpe.wordFreq(
      Tables.documents(spark, sf0001).select($"text"), "text")
    val m1 = WordPiece.trainFromWords(words.repartition(1), nMerges = 6)
    val m7 = WordPiece.trainFromWords(
      words.repartition(7, $"word"), nMerges = 6)
    assert(m1.merges === m7.merges)
    assert(m1.vocab === m7.vocab)
  }

  test("invariant gate is empty on the fixture corpus") {
    val v = WordPiece.violations(
      Tables.documents(spark, sf0001).select($"text"), "text", nMerges = 8)
    assert(v.count() === 0, v.collect().take(5).mkString("; "))
  }
}

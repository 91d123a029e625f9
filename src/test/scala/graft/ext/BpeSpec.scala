package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("wordFreq: letter-run pre-tokenization, lowercased, punctuation-split") {
    val wf = Bpe.wordFreq(docs("The cat, the CAT! x9cat"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("the" -> 2, "cat" -> 3, "x" -> 1))
  }

  test("pairCounts: per-position occurrences weighted by word frequency") {
    val pc = Bpe.pairCounts(Bpe.initialSymbols(
        Seq(("aaab", 3L), ("ccc", 1L)).toDF("word", "freq")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // aa counts at BOTH positions of aaab (×3 word freq); cc twice in ccc
    assert(pc == Map(("a", "a") -> 6L, ("a", "b") -> 3L, ("c", "c") -> 2L))
  }

  test("applyMerge: greedy left-to-right, non-overlapping (aaa → [aa, a])") {
    val merged = Bpe.applyMerge(Bpe.initialSymbols(
        Seq(("aaa", 1L), ("aabaa", 1L), ("b", 1L)).toDF("word", "freq")),
      "a", "a")
      .collect().map(r => r.getAs[String]("word") ->
        r.getAs[scala.collection.Seq[String]]("syms").toSeq).toMap
    assert(merged("aaa") == Seq("aa", "a"))
    assert(merged("aabaa") == Seq("aa", "b", "aa"))
    assert(merged("b") == Seq("b"))
  }

  test("train: hand-derived merge sequence, deterministic tie-break, early stop") {
    // aaab×3, ccc×1. Round 1: (a,a)=6 wins. Round 2: (aa,a)=3 ties
    // (a,b)=3 → left 'a' < 'aa' picks (a,b). Then (aa,ab)=3, (c,c)=2,
    // (cc,c)=1, and every word is one symbol → early stop at 5 merges.
    val merges = Bpe.train(docs("aaab aaab", "aaab ccc"), "text", nMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab"),
      ("c", "c"), ("cc", "c")))
    // reproducible across partitionings
    val again = Bpe.train(
      docs("aaab aaab", "aaab ccc").repartition(7), "text", nMerges = 10)
    assert(again == merges)
  }

  test("tokenizeWords: trained merges fold as one scan-stage projection") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val toks = Bpe.tokenizeWords(
        Seq(("aaab", 1L), ("aab", 1L), ("ba", 1L)).toDF("word", "freq"), merges)
      .collect().map(r => r.getAs[String]("word") ->
        r.getAs[scala.collection.Seq[String]]("syms").toSeq).toMap
    assert(toks("aaab") == Seq("aaab"))
    assert(toks("aab") == Seq("aa", "b")) // (a,b) can't fire after (a,a) took the a
    assert(toks("ba") == Seq("b", "a"))
    // the merge folds chain without a shuffle: no Exchange in the plan
    val plan = Bpe.tokenizeWords(
      Seq(("x", 1L)).toDF("word", "freq"), merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize gained a shuffle:\n$plan")
  }

  test("roundtrip property: trained tokenization partitions every random word") {
    // deterministic pseudo-random corpus over a 3-letter alphabet
    // (maximizes merge collisions); tokens must reassemble exactly and
    // multi-char tokens imply real compression
    val rng = new scala.util.Random(42)
    val words = (1 to 120).map { _ =>
      (1 to (1 + rng.nextInt(10))).map(_ => "abc" (rng.nextInt(3))).mkString
    }.distinct
    val corpus = docs(words.mkString(" "))
    val merges = Bpe.train(corpus, "text", nMerges = 8)
    assert(merges.nonEmpty)
    val tok = Bpe.tokenizeWords(Bpe.wordFreq(corpus, "text"), merges)
      .collect().map(r => r.getAs[String]("word") ->
        r.getAs[scala.collection.Seq[String]]("syms").toSeq)
    assert(tok.nonEmpty)
    tok.foreach { case (w, syms) =>
      assert(syms.mkString("") == w, s"roundtrip broke for '$w': $syms")
      assert(syms.forall(_.nonEmpty), s"empty token in '$w'")
    }
    // at least one word actually compressed (first merge is two chars
    // of a 3-letter alphabet — some word contains them adjacently)
    assert(tok.exists { case (w, syms) => syms.length < w.length })
  }
}

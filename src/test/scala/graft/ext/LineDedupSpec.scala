package graft.ext

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minDf: Int = 2) =
    LineDedup.removeDuplicatedLines(
        docs.toDF("doc_id", "text"), "doc_id", "text", minDf)
      .as[(Long, String, Long, Long)]
      .collect().sortBy(_._1)

  test("cross-doc duplicated lines drop from every doc, order preserved") {
    val out = run(Seq(
      1L -> "cookie banner\nreal content one\nfooter",
      2L -> "cookie banner\nreal content two\nfooter",
      3L -> "only original text"))
    assert(out(0) == ((1L, "real content one", 3L, 2L)))
    assert(out(1) == ((2L, "real content two", 3L, 2L)))
    assert(out(2) == ((3L, "only original text", 1L, 0L)))
  }

  test("within-doc repetition has df=1 and is kept (both copies)") {
    val out = run(Seq(
      1L -> "echo\nmiddle\necho",
      2L -> "something else"))
    assert(out(0) == ((1L, "echo\nmiddle\necho", 3L, 0L)))
  }

  test("within-doc copies of a boilerplate line are ALL removed") {
    val out = run(Seq(
      1L -> "spam\nkeep a\nspam",
      2L -> "spam\nkeep b"))
    assert(out(0) == ((1L, "keep a", 3L, 2L)))
    assert(out(1) == ((2L, "keep b", 2L, 1L)))
  }

  test("blank lines are structural: never counted, never removed") {
    val out = run(Seq(
      1L -> "dup\n\nkeep one\n ",
      2L -> "dup\n\nkeep two\n "))
    // the blank and whitespace-only lines survive even at df=2
    assert(out(0) == ((1L, "\nkeep one\n ", 4L, 1L)))
    assert(out(1) == ((2L, "\nkeep two\n ", 4L, 1L)))
  }

  test("a fully-boilerplate doc empties to \"\" but stays in the corpus") {
    val out = run(Seq(1L -> "dup one\ndup two", 2L -> "dup one\ndup two",
      3L -> "original"))
    assert(out(0) == ((1L, "", 2L, 2L)))
    assert(out(1) == ((2L, "", 2L, 2L)))
    assert(out.length == 3)
  }

  test("minDf dial: a df=2 line survives at minDf=3") {
    val docs = Seq(1L -> "twice\na", 2L -> "twice\nb",
      3L -> "thrice\nc", 4L -> "thrice\nd", 5L -> "thrice\ne")
    val loose = run(docs, minDf = 3)
    assert(loose(0)._2 == "twice\na" && loose(2)._2 == "c")
    val strict = run(docs, minDf = 2)
    assert(strict(0)._2 == "a" && strict(2)._2 == "c")
  }

  test("reassembly order is deterministic across partitionings") {
    val text = (0 until 50).map(i => s"line $i unique to this doc").mkString("\n")
    val noisy = Seq(1L -> text, 2L -> "x\ny", 3L -> "x\nz")
    val a = run(noisy)
    val b = LineDedup.removeDuplicatedLines(
        noisy.toDF("doc_id", "text").repartition(7), "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a(0)._2 == text)
  }
}

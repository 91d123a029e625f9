package graft.ext

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def idx(rows: (Long, String)*) =
    InvertedIndex.postings(rows.toDF("doc_id", "text"), "doc_id", "text")

  test("postings: 0-based positions, case folding, empty docs emit nothing") {
    val p = idx((1L, "Alpha beta ALPHA"), (2L, ""), (3L, "   "))
      .as[(String, Long, Long)].collect().toSet
    assert(p == Set(("alpha", 1L, 0L), ("beta", 1L, 1L), ("alpha", 1L, 2L)))
  }

  test("phrase search: consecutive-only, counts every start, first_pos is earliest") {
    val i = idx(
      (1L, "x a b y a b"),   // "a b" twice, at 1 and 4
      (2L, "a x b"),         // non-consecutive → no match
      (3L, "b a"))           // wrong order → no match
    val r = InvertedIndex.phraseSearch(i, Seq("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 2L, 1L)))
  }

  test("repeated-word phrase aligns on overlapping occurrences") {
    // "a a a" contains "a a" at starts 0 and 1
    val r = InvertedIndex.phraseSearch(idx((1L, "a a a")), Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 2L, 0L)))
  }

  test("single-word phrase degenerates to term lookup") {
    val r = InvertedIndex.phraseSearch(idx((1L, "q w q")), Seq("q"))
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((1L, 2L, 0L)))
  }
}

package graft.ext

import graft.SparkSpec

/** Pins the exact duplicate-span removal semantics (q120's operator):
  * keeper election, sub-threshold runs untouched, maximal-span union
  * of overlapping duplicated windows, whitespace normalization, and
  * the fully-duplicated-doc edge.
  */
class DuplicateSpansSpec extends SparkSpec {

  private def run(k: Int, docs: (Long, String)*): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    DuplicateSpans.removeDuplicateSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("8-token shared span: keeper (min doc_id) keeps, the other doc loses it") {
    val out = run(8,
      1L -> "x1 x2 A B C D E F G H x3",
      2L -> "y1 A B C D E F G H y2 y3")
    assert(out(1L) === (("x1 x2 A B C D E F G H x3", 0L, 11L)))
    assert(out(2L) === (("y1 y2 y3", 8L, 11L)))
  }

  test("a 7-token shared run is below k=8 and survives everywhere") {
    val out = run(8,
      1L -> "x1 A B C D E F G x2 x3 x4",
      2L -> "y1 A B C D E F G y2 y3 y4")
    assert(out(1L)._2 === 0L)
    assert(out(2L)._2 === 0L)
  }

  test("overlapping duplicated windows union into one maximal span") {
    // a 10-token shared run = three overlapping 8-grams; the cut is the
    // union of their covers — exactly tokens 2..11 of doc 2, in one piece
    val shared = "A B C D E F G H I J"
    val out = run(8, 1L -> s"$shared t1", 2L -> s"u1 $shared u2")
    assert(out(2L) === (("u1 u2", 10L, 12L)))
    assert(out(1L)._2 === 0L)
  }

  test("keeper doc keeps ALL its occurrences; non-keepers lose every occurrence") {
    val s = "A B C D E F G H"
    val out = run(8,
      1L -> s"$s mid $s",
      2L -> s"p $s q $s r")
    assert(out(1L) === ((s"$s mid $s", 0L, 17L)))
    assert(out(2L) === (("p q r", 16L, 19L)))
  }

  test("whitespace runs collapse before tokenization; blank and null docs are empty") {
    val out = run(8,
      1L -> "A  B\tC\nD   E F G H x",
      2L -> "A B C D E F G H y",
      3L -> "   ",
      4L -> null)
    // doc 1 and 2 share the 8-gram despite doc 1's messy whitespace
    assert(out(1L) === (("A B C D E F G H x", 0L, 9L)))
    assert(out(2L) === (("y", 8L, 9L)))
    assert(out(3L) === (("", 0L, 0L)))
    assert(out(4L) === (("", 0L, 0L)))
  }

  test("a fully-duplicated doc empties: n_cut == n_tokens") {
    val s = "A B C D E F G H I"
    val out = run(8, 1L -> s"intro $s outro", 2L -> s)
    assert(out(2L) === (("", 9L, 9L)))
  }
}

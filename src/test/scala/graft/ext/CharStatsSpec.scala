package graft.ext

import graft.SparkSpec

class CharStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    CharStats.charStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_chars", "n_distinct_chars", "top_char_frac_e6",
        "simpson_e6")
      .as[(Long, Int, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)

  test("hand-computed signals (fixed-point x1e6)") {
    val out = run(Seq(1L -> "aaab", 2L -> "", 3L -> "abcd", 4L -> "zzzz"))
    assert(out(0) == (1L, 4, 2L, Some(750000L), Some(625000L))) // (9+1)/16
    assert(out(1) == (2L, 0, 0L, None, None))
    assert(out(2) == (3L, 4, 4L, Some(250000L), Some(250000L)))
    assert(out(3) == (4L, 4, 1L, Some(1000000L), Some(1000000L)))
  }

  test("unicode characters count as single characters") {
    val out = run(Seq(1L -> "ααββ", 2L -> "日本語"))
    assert(out(0) == (1L, 4, 2L, Some(500000L), Some(500000L)))
    assert(out(1)._2 == 3 && out(1)._3 == 3L && out(1)._4.contains(333333L))
  }

  test("simpson bounds: 1e6/n_distinct ≤ simpson_e6 ≤ 1e6; flood detection") {
    val docs = (1L to 40L).map(i => i -> ("abcdefgh" * (i % 5 + 1).toInt))
    run(docs).foreach { r =>
      assert(r._5.get >= 1000000L / r._3 - 1 && r._5.get <= 1000000L)
      assert(r._5.get == 125000L) // uniform over 8 chars
    }
    val flood = run(Seq(1L -> ("x" * 1000)))
    assert(flood(0)._4.contains(1000000L) && flood(0)._5.contains(1000000L))
  }

  test("no rounding boundary can split engines: values are exact integer DIV") {
    // the sf0.1 regression shape: ss/n² = 598/6400 = 0.09343750 exactly —
    // round(·,6) disagrees across engines, integer DIV cannot
    val doc = "ab" * 8 // n=16, counts {a:8, b:8}, ss=128, 128e6 DIV 256
    val out = run(Seq(1L -> doc))
    assert(out(0)._5.contains(500000L))
  }
}

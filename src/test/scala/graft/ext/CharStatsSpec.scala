package graft.ext

import graft.SparkSpec

class CharStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    CharStats.charStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_chars", "n_distinct_chars", "top_char_frac", "simpson")
      .as[(Long, Int, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)

  test("hand-computed signals") {
    val out = run(Seq(1L -> "aaab", 2L -> "", 3L -> "abcd", 4L -> "zzzz"))
    assert(out(0) == (1L, 4, 2L, Some(0.75), Some(0.625))) // (9+1)/16
    assert(out(1) == (2L, 0, 0L, None, None))
    assert(out(2) == (3L, 4, 4L, Some(0.25), Some(0.25)))
    assert(out(3) == (4L, 4, 1L, Some(1.0), Some(1.0)))
  }

  test("unicode characters count as single characters") {
    val out = run(Seq(1L -> "ααββ", 2L -> "日本語"))
    assert(out(0) == (1L, 4, 2L, Some(0.5), Some(0.5)))
    assert(out(1)._2 == 3 && out(1)._3 == 3L && out(1)._4.contains(0.333333))
  }

  test("simpson bounds: 1/n_distinct ≤ simpson ≤ 1; flood detection") {
    val docs = (1L to 40L).map(i => i -> ("abcdefgh" * (i % 5 + 1).toInt))
    run(docs).foreach { r =>
      assert(r._5.get >= 1.0 / r._3 - 1e-9 && r._5.get <= 1.0)
      assert(r._5.get == 0.125) // uniform over 8 chars
    }
    val flood = run(Seq(1L -> ("x" * 1000)))
    assert(flood(0)._4.contains(1.0) && flood(0)._5.contains(1.0))
  }
}

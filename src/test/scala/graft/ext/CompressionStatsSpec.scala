package graft.ext

import graft.SparkSpec

class CompressionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("signal direction: repetition compresses far below prose, prose below noise") {
    val rep = "spam spam spam spam spam spam spam spam spam spam " * 20
    val prose = "The quick brown fox jumps over the lazy dog while seven " +
      "wizards brew quartz elixirs by the fjord under a gibbous moon. " * 10
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(1000)((rnd.nextInt(93) + 33).toChar).mkString
    val out = CompressionStats.perDoc(
        Seq((1L, rep), (2L, prose), (3L, noise)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).ratio_e6 < out(2L).ratio_e6,
      s"repetition ${out(1L).ratio_e6} should beat prose ${out(2L).ratio_e6}")
    assert(out(2L).ratio_e6 < out(3L).ratio_e6,
      s"prose ${out(2L).ratio_e6} should beat noise ${out(3L).ratio_e6}")
    // the q89 invariants on hand data
    for (r <- out.values) {
      assert(r.deflate_bytes > 0 &&
        r.deflate_bytes <= r.raw_bytes + 64 + r.raw_bytes / 1000)
      assert(r.deflate10_bytes < 10 * r.deflate_bytes)
    }
  }

  test("raw_bytes counts UTF-8 bytes; many partitions exercise the deflater lifecycle") {
    val rows = (1L to 40L).map(i => (i, s"döc-$i " * 30))
    val out = CompressionStats.perDoc(
        rows.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 40)
    for ((id, text) <- rows)
      assert(out(id).raw_bytes == text.getBytes("UTF-8").length.toLong)
    // determinism across partitionings (zlib is deterministic per level)
    val again = CompressionStats.perDoc(
        rows.toDF("doc_id", "text").repartition(3), "doc_id", "text")
      .collect().map(r => r.doc_id -> r.deflate_bytes).toMap
    assert(again == out.view.mapValues(_.deflate_bytes).toMap)
  }
}

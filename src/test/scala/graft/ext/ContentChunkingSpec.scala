package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ContentChunkingSpec extends SparkSpec {

  private def pseudoBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 33).toByte
      i += 1
    }
    out
  }

  test("tiling, bounds and determinism over assorted payloads") {
    for (n <- Seq(0, 1, 31, 32, 33, 64, 127, 128, 129, 1000, 8192);
        seed <- Seq(1L, 2L, 3L)) {
      val data = pseudoBytes(n, seed)
      val cs = ContentChunking.chunk(data, 32, 64, 128)
      if (n == 0) assert(cs.isEmpty)
      else {
        assert(cs.head.offset == 0 && cs.map(_.length).sum == n,
          s"n=$n seed=$seed")
        assert(cs.sliding(2).forall {
          case Seq(a, b) => a.offset + a.length == b.offset
          case _ => true
        })
        assert(cs.dropRight(1).forall(c => c.length >= 32 && c.length <= 128))
        assert(cs.last.length <= 128)
        assert(ContentChunking.chunk(data, 32, 64, 128) == cs)
      }
    }
  }

  test("constant payloads degrade gracefully (bounds still hold)") {
    for (b <- Seq(0, 65, 255)) {
      val data = Array.fill[Byte](4096)(b.toByte)
      val cs = ContentChunking.chunk(data, 32, 64, 128)
      assert(cs.map(_.length).sum == 4096)
      assert(cs.dropRight(1).forall(c => c.length >= 32 && c.length <= 128))
      // all non-final chunk hashes identical: same content, same length
      assert(cs.dropRight(1).map(c => (c.length, c.hash)).distinct.size <= 2)
    }
  }

  test("normalization pulls sizes toward avg: mean within [avg/2, 2*avg]") {
    val data = pseudoBytes(1 << 18, 42L)
    val cs = ContentChunking.chunk(data, 32, 64, 128)
    val mean = cs.map(_.length).sum.toDouble / cs.length
    assert(mean >= 32 && mean <= 128, s"mean=$mean")
    // and the max-cut escape hatch must not dominate on random data
    assert(cs.count(_.length == 128).toDouble / cs.length < 0.5)
  }

  test("single-byte insertion re-synchronizes: most chunk hashes survive") {
    val data = pseudoBytes(8192, 7L)
    val edited = data.take(10) ++ Array(0x55.toByte) ++ data.drop(10)
    val a = ContentChunking.chunk(data, 32, 64, 128).map(_.hash)
    val b = ContentChunking.chunk(edited, 32, 64, 128).map(_.hash)
    val shared = a.toSet.intersect(b.toSet).size
    // the edit can only disturb chunks until the gear window re-syncs;
    // on 8 KB / ~64 B chunks that is a handful of chunks at the front
    assert(shared >= a.length - 8, s"shared=$shared of ${a.length}")
  }

  test("corpus-calibrated resync on the real documents table (sf0.001)") {
    import spark.implicits._
    // mirror the q170 payload construction; measure the survival rate
    // under a front edit across the whole corpus — the floor here is
    // what the scaladoc promises, measured rather than sworn
    val rows = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (_, text) =>
        val payload = Seq(text, text, text, text).mkString(" ")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val edited = ("X".getBytes ++ payload)
        val a = ContentChunking.chunk(payload, 32, 64, 128).map(_.hash)
        val b = ContentChunking.chunk(edited, 32, 64, 128).map(_.hash)
        // multiset overlap: the 4x-repeated text makes duplicate chunk
        // hashes legitimate, and a set intersection would undercount
        val bc = b.groupBy(identity).map { case (k, v) => k -> v.size }
        val shared = a.groupBy(identity).map { case (k, v) =>
          math.min(v.size, bc.getOrElse(k, 0))
        }.sum
        (a.length.toLong, shared.toLong)
      }
      .collect()
    val total = rows.map(_._1).sum.toDouble
    val shared = rows.map(_._2).sum.toDouble
    assert(shared / total > 0.5, s"corpus resync rate ${shared / total}")
  }

  test("dedupStats: identical blobs store once") {
    import spark.implicits._
    val blob = pseudoBytes(4096, 11L)
    val df = Seq((1L, blob), (2L, blob), (3L, pseudoBytes(4096, 12L)))
      .toDF("id", "payload")
    val table = ContentChunking.chunks(df, "id", "payload", 32, 64, 128)
    val stats = ContentChunking.dedupStats(table).collect().head
    val logical = stats.getAs[Long]("logical_bytes")
    val stored = stats.getAs[Long]("stored_bytes")
    assert(logical == 3 * 4096L)
    // blobs 1 and 2 share every chunk: stored ≈ 2/3 of logical
    assert(stored <= logical * 2 / 3)
  }
}

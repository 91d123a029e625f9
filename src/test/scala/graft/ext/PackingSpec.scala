package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(docs: Seq[(Long, String)], seqLen: Long, nBuckets: Int) =
    Packing.packSequences(docs.toDF("doc_id", "text"), "doc_id",
      TextFunctions.tokenCount(col("text")), seqLen, nBuckets, salt = "t")

  test("offsets are a gapless concatenation per bucket; packs chunk by seqLen") {
    val docs = (1L to 50L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim)
    val rows = pack(docs, seqLen = 10, nBuckets = 4)
      .select("doc_id", "bucket", "n_tokens", "start_offset", "pack_idx")
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(rows.length == 50)
    rows.groupBy(_._2).foreach { case (bucket, rs) =>
      val inOrder = rs.sortBy(_._4)
      // gapless: each doc starts exactly where the previous ended
      inOrder.zip(inOrder.scanLeft(0L)(_ + _._3)).foreach { case (r, expected) =>
        assert(r._4 == expected, s"bucket $bucket: gap at doc ${r._1}")
      }
      inOrder.foreach(r => assert(r._5 == r._4 / 10))
    }
  }

  test("deterministic and partition-stable: repartitioned input packs identically") {
    val docs = (1L to 80L).map(i => i -> ("tok " * (i % 5 + 1).toInt).trim)
    val df = docs.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(d, "doc_id",
          TextFunctions.tokenCount(col("text")), 16, 4, salt = "t")
        .select("doc_id", "bucket", "start_offset", "pack_idx")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(df) == run(df.repartition(13)))
  }

  test("reserved output column names on the input are an error, not silent corruption") {
    val df = Seq((1L, "a b", 7)).toDF("doc_id", "text", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(df, "doc_id",
        TextFunctions.tokenCount(col("text")), 16, 4)
    }
    assert(e.getMessage.contains("n_tokens"))
  }

  test("adding documents never moves EARLIER documents in their bucket stream") {
    // hash-ordered streams are append-stable in prefix: a doc's offset
    // only changes if a NEW doc hashes ahead of it in the same bucket —
    // docs hashing after it cannot shift it. Verify directly: offsets
    // with the 20-doc corpus match offsets with 10 more docs appended,
    // for every original doc whose bucket-stream prefix is unchanged.
    val base = (1L to 20L).map(i => i -> "alpha beta gamma")
    val more = base ++ (21L to 30L).map(i => i -> "delta epsilon")
    val a = pack(base, 8, 2).select("doc_id", "bucket", "start_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val b = pack(more, 8, 2).select("doc_id", "bucket", "start_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // bucket membership of old docs never changes (pure key hash)
    base.foreach { case (id, _) => assert(a(id)._1 == b(id)._1) }
    // offsets only grow or stay equal (new docs can only insert ahead)
    base.foreach { case (id, _) => assert(b(id)._2 >= a(id)._2) }
  }
}

package graft.ext

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(docs: Seq[(Long, String)], chunkTokens: Int, overlap: Int) =
    Chunking.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
        chunkTokens, overlap)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._2))

  test("hand-checked windows: 10 tokens, chunk 4, overlap 1") {
    val rows = chunk(Seq(1L -> "a b c d e f g h i j"), 4, 1)
    // stride 3 → starts 0,3,6,9; last window is the single token "j"
    assert(rows.map(r => (r._2, r._3, r._4, r._5)).toSeq == Seq(
      (0, 0, 4, "a b c d"),
      (1, 3, 4, "d e f g"),
      (2, 6, 4, "g h i j"),
      (3, 9, 1, "j")))
  }

  test("coverage: every token index falls in at least one window") {
    val docs = (1L to 30L).map(i => i -> ("t " * (i % 11).toInt).trim)
    val n = docs.toMap.map { case (id, t) =>
      id -> (if (t.isEmpty) 0 else t.split(" ").length)
    }
    val rows = chunk(docs, 5, 2)
    docs.foreach { case (id, _) =>
      val covered = rows.filter(_._1 == id)
        .flatMap(r => r._3 until (r._3 + r._4)).toSet
      assert(covered == (0 until n(id)).toSet, s"doc $id coverage")
    }
    // windows never exceed chunkTokens and are never empty
    rows.foreach(r => assert(r._4 > 0 && r._4 <= 5))
    // chunk_idx is dense and start = idx * stride
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).toSeq == rs.indices.toSeq)
      rs.foreach(r => assert(r._3 == r._2 * 3))
    }
  }

  test("overlap 0 reassembles the token stream exactly; empty docs emit nothing") {
    val docs = Seq(1L -> "u v w x y z", 2L -> "", 3L -> "   ", 4L -> "solo")
    val rows = chunk(docs, 4, 0)
    assert(rows.filter(_._1 == 1L).map(_._5).mkString(" ") == "u v w x y z")
    assert(!rows.exists(r => r._1 == 2L || r._1 == 3L))
    assert(rows.filter(_._1 == 4L).map(r => (r._2, r._5)).toSeq == Seq(0 -> "solo"))
  }

  test("invalid dials are rejected") {
    val df = Seq(1L -> "a").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkDocs(df, "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkDocs(df, "doc_id", "text", 4, overlap = 4)
    }
  }
}

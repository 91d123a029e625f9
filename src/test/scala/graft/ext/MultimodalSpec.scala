package graft.ext

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: deterministic, fixed dim, byte counts real") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf0001))
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2) // deterministic across runs/partitionings
    assert(f1.values.forall(_.length == 8))
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("frameSample: n frames reassemble to original payload prefix") {
    val media = Multimodal.toMedia(
      Seq((7L, "abcdefghij", "src")).toDF("doc_id", "text", "source"))
    val frames = Multimodal.frameSample(media, nFrames = 5)
      .orderBy("frame_idx").collect()
    assert(frames.length == 5)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_payload"))
    assert(new String(joined.take(10), "UTF-8") == "abcdefghij")
  }

  test("empty payload yields no frames, features still defined") {
    val media = Multimodal.toMedia(
      Seq((8L, "", "src")).toDF("doc_id", "text", "source"))
    assert(Multimodal.frameSample(media, 3).count() == 0)
    val f = Multimodal.extractFeatures(media, dim = 4).collect().head
    assert(f.n_bytes == 0 && f.features.length == 4)
  }
}

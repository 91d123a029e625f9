package graft.ext

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val model = ProductQuantization.train(emb, dim = 64)

  test("model shape and code range") {
    assert(model.m == 16 && model.k == 64 && model.subDim == 4)
    assert(model.centroids.length == 16)
    assert(model.centroids.forall(_.length == 64))
    assert(model.centroids.forall(_.forall(_.length == 4)))
    val codes = ProductQuantization.encode(emb, model)
      .select(col("codes")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(_.length == 16)) // 16×6 bits = 12 bytes/vector
    assert(codes.forall(_.forall(c => c >= 0 && c < 64)))
  }

  test("encoding is deterministic across partitionings") {
    val a = ProductQuantization.encode(emb, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = ProductQuantization.encode(emb.repartition(13), model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("adc_dist is exactly the table-lookup sum of the model's arithmetic") {
    // replay ADC by hand from the model + codes for one query row:
    // the plan's value must match the driver-side double arithmetic
    val enc = ProductQuantization.encode(emb, model)
    val q = emb.filter(col("vec_id") === 0L)
    val out = ProductQuantization.adcTopK(enc, q, topK = 3, model)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length == 3 && out.map(_._3).toSeq == Seq(1, 2, 3))

    val qv = q.select(graft.functions.VectorFunctions.normalize(col("embedding")))
      .head().getSeq[Double](0).toArray
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def adc(cand: Long): Double = {
      var s = 0.0
      for (j <- 0 until model.m) {
        val c = model.centroids(j)(codes(cand)(j))
        var dot = 0.0
        var n2 = 0.0
        for (d <- 0 until model.subDim) {
          dot += qv(j * model.subDim + d) * c(d)
          n2 += c(d) * c(d)
        }
        s += n2 - 2.0 * dot
      }
      s
    }
    out.foreach { case (cand, dist, _) =>
      assert(math.abs(dist - adc(cand)) < 1e-6, s"cand $cand")
    }
  }

  test("ivfAdcTopK probing ALL cells == adcTopK exactly (cells are pure restriction)") {
    val q = emb.filter(col("vec_id") < 5)
    val full = ProductQuantization.adcTopK(
        ProductQuantization.encode(emb, model), q, topK = 5, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val allProbes = ProductQuantization.ivfAdcTopK(
        emb, q, topK = 5, model, nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(allProbes == full)
  }

  test("ivfAdcTopK recall clears the q100 floor with margin") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ProductQuantization.ivfAdcTopK(emb, q, topK = 5, model)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall under gate floor")
  }

  test("ADC top-5 recall vs exact cosine clears the gate floor with margin") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ProductQuantization.adcTopK(
        ProductQuantization.encode(emb, model), q, topK = 5, model)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.30, s"recall $recall under gate floor")
  }
}

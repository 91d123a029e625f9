package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{ProductQuantization, SimilaritySearch}

/** Measures the two-stage (IVFADC → exact re-rank) recall vs the plain
  * ADC-ranked path at equal probe budget — pins q114's floor.
  */
object RerankCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = ProductQuantization.ivfAdcResidualTopK(emb, q, topK = 5,
          pqIters = 3)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (pi <- Seq(2, 3); ci <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        val rr = ProductQuantization.ivfAdcRerankTopK(emb, q, topK = 5,
            rerankFactor = 10, coarseIters = ci, pqIters = pi)
          .select("query_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[rerank] $sf%8s pqIters=$pi coarseIters=$ci plain=${(exact & plain).size.toDouble / exact.size}%.3f " +
          f"rerank=${(exact & rr).size.toDouble / exact.size}%.3f wall=$dt%.2f s")
      }
    }
    spark.stop()
  }
}

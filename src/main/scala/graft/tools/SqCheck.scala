package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{ScalarQuantization, SimilaritySearch}

/** Measures SQ8 recall vs brute force across SFs — pins q146's floor. */
object SqCheck {
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
      val (lo, hi) = ScalarQuantization.train(emb, "embedding")
      val sq = ScalarQuantization.sqTopK(emb, q, k = 5, lo, hi)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfSq = ScalarQuantization.ivfSqTopK(emb, q, k = 5, lo, hi)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = SimilaritySearch.ivfTopK(emb, q, k = 5, dim = 64)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[sq8] $sf%8s recall=${(exact & sq).size.toDouble / exact.size}%.3f ivfSq=${(exact & ivfSq).size.toDouble / exact.size}%.3f ivf=${(exact & ivf).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.SimilaritySearch

/** Measures ANN overall recall vs brute force across SFs — used to pin
  * the q27/q35 recall-floor invariants at values that hold with margin
  * on the driver's correctness (sf0.01) and bench (sf0.1) datasets.
  */
object RecallCheck {
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
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = SimilaritySearch.ivfTopK(emb, q, k = 5, dim = 64)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = emb.count()
      println(f"[recall] $sf%8s n=$n%7d lsh=${(exact & lsh).size.toDouble / exact.size}%.3f ivf=${(exact & ivf).size.toDouble / exact.size}%.3f exactK=${exact.size}")
    }
    spark.stop()
  }
}

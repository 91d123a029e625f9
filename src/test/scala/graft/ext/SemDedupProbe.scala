package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness: semdedup pair recall vs exact brute
  * force across SFs and dials — pins q60's recall floor from data, not
  * guesswork. Run: sbt "Test/runMain graft.ext.SemDedupProbe".
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = graft.core.Tables.embeddings(spark, s"/root/testdata/$sf")
      val brute = SimilaritySearch.cosineNearDuplicates(emb, 0.4)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nc, na) <- Seq((8, 1), (8, 2), (16, 2), (16, 3))) {
        val sem = SemDedup.pairs(emb, 0.4, nCells = nc, iters = 2, nAssign = na)
          .select("vec_a", "vec_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val extra = sem -- brute
        val recall = if (brute.isEmpty) 1.0 else (sem & brute).size.toDouble / brute.size
        println(f"PROBE $sf nCells=$nc nAssign=$na brute=${brute.size} sem=${sem.size} recall=$recall%.3f extra=${extra.size}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

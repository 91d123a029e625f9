package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of SemDedup.pairs at SPARK_GRAFT_SF_DIR. */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    println(s"[semprof] n_vectors=${emb.count()} dims=" +
      emb.select(size(col("embedding"))).head().getInt(0))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[semprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // whole operator, twice
    t("pairs (cold)") {
      graft.ext.SemDedup.pairs(emb, 0.4, nCells = 16, iters = 2, nAssign = 3).count()
    }
    t("pairs (warm)") {
      graft.ext.SemDedup.pairs(emb, 0.4, nCells = 16, iters = 2, nAssign = 3).count()
    }
    // brute leg for comparison
    t("brute triangle") {
      graft.ext.SimilaritySearch.cosineNearDuplicates(emb, 0.4).count()
    }
    // stage isolation
    t("iters=0 nAssign=1") {
      graft.ext.SemDedup.pairs(emb, 0.4, nCells = 16, iters = 0, nAssign = 1).count()
    }
    t("iters=2 nAssign=1") {
      graft.ext.SemDedup.pairs(emb, 0.4, nCells = 16, iters = 2, nAssign = 1).count()
    }
    t("iters=0 nAssign=3") {
      graft.ext.SemDedup.pairs(emb, 0.4, nCells = 16, iters = 0, nAssign = 3).count()
    }
    t("ivf q45 shape") {
      graft.ext.SimilaritySearch.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        k = 5, dim = 64, nCells = 16, nProbe = 4, iters = 2).count()
    }
    spark.stop()
  }
}

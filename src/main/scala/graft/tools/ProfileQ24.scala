package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Shingling
import graft.core.Partitioning

/** Stage-by-stage profiler for q24 (exact n-gram Jaccard): times each
  * internal phase of NGramJaccard.allPairs separately so optimization
  * effort lands where the seconds actually are. Temporary diagnostic —
  * mirrors NGramJaccard.scala's stages; keep in sync when that changes.
  */
object ProfileQ24 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.documents(spark, sfDir)
    val threshold = 0.5
    val n = 3

    // warmup whole pipeline once at sf0.001
    time("warmup sf0.001") {
      graft.ext.NGramJaccard.allPairs(
        graft.core.Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text", n, threshold).count()
    }
    spark.catalog.clearCache()

    (1 to 2).foreach { pass =>
      println(s"── pass $pass ──")
      val sh0 = Shingling.shingleFrame(docs, "doc_id", "text", n)
        .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("sh"))
        .cache()
      time("shingle+hash (cache fill)") { sh0.count() }
      val tok = sh0.select(col("id"), explode(col("sh")).as("s"))
      time("tok count") { tok.count() }
      val dfs = tok.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val ranked = tok.join(dfs, "s")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      val prefix = ranked.join(sizes, "id")
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .select(col("id"), col("s"), col("rn"), col("sz"))
        .cache()
      time("prefix (cache fill)") { prefix.count() }
      val cand = prefix.as("a")
        .join(prefix.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .filter(
          least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) + 1 >=
            ceil(lit(threshold / (1 + threshold)) * (col("a.sz") + col("b.sz"))))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .distinct()
        .cache()
      time("candidate join") { println(s"  candidates: ${cand.count()}") }
      val out = cand
        .join(sh0.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sh0.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          round(Shingling.jaccard(col("sh_a"), col("sh_b")), 6))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      time("verify") { println(s"  pairs: ${out.count()}") }
      spark.catalog.clearCache()
      // full end-to-end as Bench sees it
      time("END-TO-END allPairs") {
        graft.ext.NGramJaccard.allPairs(docs, "doc_id", "text", n, threshold).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a comma-separated subset of SparkEntry queries
  * (SPARK_GRAFT_QUERIES) at SPARK_GRAFT_SF_DIR, two passes, min —
  * for isolating environment effects (heap, load) without the full
  * 79-query bench.
  */
object ProfileSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    // warmup at smallest sf
    names.foreach { n =>
      try qs(n)(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    names.foreach { n =>
      val a = once(n); val b = once(n)
      println(f"[profile] $n%-32s min=${math.min(a, b)}%.2f s  (p1=$a%.2f p2=$b%.2f) heapMB=$heap")
    }
    spark.stop()
  }
}

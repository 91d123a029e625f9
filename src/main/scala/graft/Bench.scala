package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * A warmup pass (flagship query at the bench SF) runs first so JVM/
  * codegen/shuffle-service initialization doesn't land inside the first
  * measured query; queries then run in sorted-name order for stable,
  * comparable per-query numbers across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: every query once at the smallest SF — exercises the same
    // code paths (JIT-compiles the higher-order-function interpreters,
    // codegen, shuffle machinery) on cheap data so first-run JIT cost
    // doesn't land inside the measured run. Measured ~3× on the
    // HOF-heavy dedup queries.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, if (new java.io.File(warmDir).isDirectory) warmDir else sfDir)
        .count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    // Two measured passes, min per query: this VM is co-tenant — a
    // single pass can read 2-3× slow purely from neighbor load (the
    // round-2 bench was invalidated exactly that way). The min of two
    // passes is the contention-free estimate; loadavg is recorded so
    // the driver can discount runs taken under external load.
    def measure(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators may cache intermediates (e.g. shingle frames); drop them
        // so queries don't contend for storage memory across the run
        spark.catalog.clearCache()
        name -> dt
      }
    val results = (measure() ++ measure())
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      .toSeq.sortBy(_._1)
    val loadavg = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).mkString(" ")
      finally src.close()
    } catch { case _: Throwable => "" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg":"$loadavg"}""")
    spark.stop()
  }
}

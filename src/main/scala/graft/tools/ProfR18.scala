package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-18 measurement harness: per-query wall time + Spark job /
  * stage / task counts (the fixed-point fusion work targets job-count,
  * so the A/B evidence must show it). Args: queries (comma prefixes).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROF_REPS (default 3).
  */
object ProfR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    val prefixes = args.headOption.map(_.split(",").toSeq).getOrElse(Nil)
    // A/B knob: PROF_CONF="spark.x=v;spark.y=v" applied at session build
    val extraConf: Seq[(String, String)] = sys.env.get("PROF_CONF")
      .map(_.split(";").toSeq.filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) })
      .getOrElse(Nil)
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    val spark = extraConf.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val verbose = sys.env.contains("PROF_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val names = j.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks})")
          System.err.println(
            s"[job ${j.jobId}] stages=${j.stageIds.size} " +
              names.mkString(" | "))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    // warmup at the smallest SF
    selected.foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    selected.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // settle the listener bus so counts attribute to this rep
        Thread.sleep(300)
        val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
        val w0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - w0) / 1e9
        Thread.sleep(300) // let queued listener events drain
        spark.catalog.clearCache()
        (dt, jobs.get - j0, stages.get - s0, tasks.get - t0)
      }
      val best = times.minBy(_._1)
      println(f"[prof] $name%-34s min=${best._1}%6.2fs  " +
        f"jobs=${best._2}%4d stages=${best._3}%4d tasks=${best._4}%6d  " +
        f"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

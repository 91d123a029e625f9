package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ext.EventAnalytics
import graft.streaming.AnalyticsStreams._

/** Stream == batch-twin equality for the incremental funnel and
  * retention operators: the same synthetic event set is (a) run through
  * the batch operators and (b) delivered file-by-file to the streaming
  * ones — in time order with a zero-delay watermark (folds finalize
  * EVERY micro-batch, proving the incremental path), and fully shuffled
  * with a horizon watermark (proving the watermark-finalized fold
  * restores batch order under maximal disorder). Results must match
  * exactly in both modes.
  */
class AnalyticsStreamsSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  // closure horizon > the 35-day data span: no user finalizes before
  // the sentinels, so the final rows equal the batch computation
  private val idleMs = 40L * 86400000L

  /** Deterministic synthetic stream: 40 users × LCG-driven events over
    * ~5 weeks with µs-resolution timestamps (ms-truncation bugs would
    * surface), including same-µs ties and users missing various steps.
    */
  private def mkEvents(): Seq[UserEvent] = {
    val types = Array("view", "click", "purchase", "signup", "other")
    var seed = 0x2545F4914F6CDD1DL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 16 }
    val base = 1700000000000000L // µs
    (0 until 40).flatMap { u =>
      val n = (next() % 20 + 5).toInt
      (0 until n).map { _ =>
        val us = base + (next() % (35L * 86400000000L)).abs
        val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos(((us % 1000000L) * 1000L).toInt)
        UserEvent(u.toLong, ts, types((next() % types.length).abs.toInt))
      }
    }
  }

  /** Write `events` to `dir` as `nFiles` parquet files (partitioned by
    * `slice`), plus two far-future sentinel files that advance the
    * watermark past every real event and then past every timeout.
    */
  private def writeFiles(events: Seq[UserEvent], dir: String,
      nFiles: Int, slice: (UserEvent, Int) => Int): Unit = {
    import spark.implicits._
    val maxUs = events.map(e => e.ts.getTime * 1000L).max
    (0 until nFiles).foreach { f =>
      val part = events.zipWithIndex.collect {
        case (e, i) if slice(e, i) == f => e
      }
      part.toDS().coalesce(1).write.parquet(s"$dir/f$f")
    }
    Seq(40L, 81L).zipWithIndex.foreach { case (days, i) =>
      val us = maxUs + days * 86400000000L
      Seq(UserEvent(-1L, new Timestamp(us / 1000L), "other")).toDS()
        .coalesce(1).write.parquet(s"$dir/sentinel$i")
    }
  }

  private def streamOf(dir: String): Dataset[UserEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[UserEvent].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir + "/*")
      .as[UserEvent]
  }

  private def runToMemory(out: DataFrame, name: String): DataFrame = {
    val q = out.writeStream
      .format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"ck_$name").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private def batchFunnel(events: Seq[UserEvent]): Map[Long, (Seq[Long], Long)] = {
    import spark.implicits._
    EventAnalytics.orderedFunnel(events.toDF(), "user_id", "ts",
        "event_type", steps)
      .collect().map { r =>
        val su = (0 until steps.length).map(i =>
          if (r.isNullAt(r.fieldIndex(s"step${i}_us"))) -1L
          else r.getLong(r.fieldIndex(s"step${i}_us")))
        r.getLong(0) -> ((su, r.getLong(r.fieldIndex("funnel_depth"))))
      }.toMap
  }

  private def batchRetention(events: Seq[UserEvent]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EventAnalytics.retentionCohorts(events.toDF(), "user_id", "ts",
        "event_type", "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def checkFunnel(events: Seq[UserEvent], streamed: DataFrame): Unit = {
    val got = streamed.collect().map { r =>
      r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))
    }.toMap
    val want = batchFunnel(events)
    assert(got.keySet === want.keySet)
    want.foreach { case (u, (su, d)) =>
      assert(got(u)._1.toSeq === su, s"user $u step timestamps")
      assert(got(u)._2 === d, s"user $u depth")
    }
  }

  private def checkRetention(events: Seq[UserEvent], streamed: DataFrame): Unit = {
    // each (user, cohort, offset) emitted exactly once...
    val rows = streamed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === rows.distinct.length, "duplicate membership rows")
    // ...so the count per (cohort, offset) equals batch countDistinct
    val got = rows.groupBy(t => (t._2, t._3))
      .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSet
    assert(got === batchRetention(events))
  }

  test("funnel stream == batch twin, in-order delivery, zero-delay watermark") {
    val events = mkEvents()
    val sorted = events.sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val dir = Files.createTempDirectory("funnel_inorder").toString
    // 4 time-contiguous slices: every batch advances the watermark and
    // folds the previous batch's events — the genuinely incremental path
    writeFiles(sorted, dir, 4,
      (_, i) => math.min(3, i * 4 / sorted.length))
    val out = funnelStream(streamOf(dir), steps, "0 seconds", idleMs)
    checkFunnel(events, runToMemory(out.toDF(), "funnel_inorder"))
  }

  test("funnel stream == batch twin under fully shuffled delivery") {
    val events = mkEvents()
    val dir = Files.createTempDirectory("funnel_shuffled").toString
    // slices by index hash: each file spans the whole time range, so
    // almost every event is "out of order" relative to file order; the
    // 40-day watermark holds everything pending until the sentinels
    writeFiles(events, dir, 4, (_, i) => (i * 2654435761L % 4).toInt.abs)
    val out = funnelStream(streamOf(dir), steps, "40 days", idleMs)
    checkFunnel(events, runToMemory(out.toDF(), "funnel_shuffled"))
  }

  test("retention stream == batch twin, in-order delivery") {
    val events = mkEvents()
    val sorted = events.sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val dir = Files.createTempDirectory("ret_inorder").toString
    writeFiles(sorted, dir, 4,
      (_, i) => math.min(3, i * 4 / sorted.length))
    val out = retentionStream(streamOf(dir), "signup", "0 seconds", idleMs)
    checkRetention(events, runToMemory(out.toDF(), "ret_inorder"))
  }

  test("retention stream == batch twin under fully shuffled delivery") {
    val events = mkEvents()
    val dir = Files.createTempDirectory("ret_shuffled").toString
    writeFiles(events, dir, 4, (_, i) => (i * 2654435761L % 4).toInt.abs)
    val out = retentionStream(streamOf(dir), "signup", "40 days", idleMs)
    checkRetention(events, runToMemory(out.toDF(), "ret_shuffled"))
  }
}

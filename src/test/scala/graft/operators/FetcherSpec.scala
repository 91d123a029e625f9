package graft.operators

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSpec
import graft.orchestration.TaskGraph
import graft.sources.ParquetTable

class FetcherSpec extends SparkSpec {
  import spark.implicits._

  /** Scripted fetcher: per-key queue of outcomes; records every call. */
  private class Scripted(script: Map[String, Seq[Either[String, String]]])
      extends Fetcher {
    val calls = mutable.Buffer[(String, String)]() // (key, ua)
    private val remaining = mutable.Map(script.view.mapValues(_.toBuffer).toSeq: _*)
    override def fetch(key: String,
        headers: Map[String, String]): Either[String, String] = {
      calls += (key -> headers("User-Agent"))
      remaining.get(key).filter(_.nonEmpty).map(_.remove(0))
        .getOrElse(Left(s"unscripted key $key"))
    }
  }

  private val noSleep = FetchConfig(
    pageSleepMs = 0, areaSleepMs = 0, retryDelayMs = 0)

  test("continue-on-error: a permanently failing key is skipped, batch proceeds") {
    val f = new Scripted(Map(
      "A" -> Seq(Right("payload-a")),
      "B" -> Seq(Left("boom"), Left("boom again")), // fails initial + retry
      "C" -> Seq(Right("payload-c"))))
    val r = Fetcher.fetchBatch(f, Seq("A", "B", "C"), noSleep.copy(maxRetries = 1))
    assert(r.landed == Seq("A" -> "payload-a", "C" -> "payload-c"))
    assert(r.failed == Seq("B" -> "boom again")) // last error reported
    assert(f.calls.map(_._1) == Seq("A", "B", "B", "C")) // retry then move on
  }

  test("retry: transient failure recovers within maxRetries; UA rotates per attempt") {
    val f = new Scripted(Map("A" -> Seq(Left("flake"), Right("ok"))))
    val r = Fetcher.fetchBatch(f, Seq("A"), noSleep.copy(maxRetries = 1))
    assert(r.landed == Seq("A" -> "ok") && r.failed.isEmpty)
    assert(f.calls.size == 2)
    assert(f.calls(0)._2 != f.calls(1)._2) // rotated between attempts
  }

  test("politeness + retry delays go through the injected sleeper") {
    val sleeps = mutable.Buffer[Long]()
    val f = new Scripted(Map(
      "A" -> Seq(Left("flake"), Right("ok")),
      "B" -> Seq(Right("ok"))))
    Fetcher.fetchBatch(f, Seq("A", "B"),
      FetchConfig(areaSleepMs = 1000, retryDelayMs = 250, maxRetries = 1),
      sleeper = sleeps += _)
    // A's retry delay, then the between-keys politeness sleep before B
    assert(sleeps == Seq(250L, 1000L))
  }

  test("zero results is not an error: FixtureFetcher lands absent keys as empty pages") {
    val f = new Fetcher.FixtureFetcher(Map("OX1" -> "<html/>"))
    assert(f.fetch("OX1", Map("User-Agent" -> "x")) == Right("<html/>"))
    assert(f.fetch("OX9", Map("User-Agent" -> "x")) == Right(""))
  }

  test("fetchPaged: page walk with PAGE_SLEEP pacing, stops at empty page and at the cap") {
    val sleeps = mutable.Buffer[Long]()
    val f = new Scripted(Map(
      "k?page=0" -> Seq(Right("p0")), "k?page=1" -> Seq(Right("p1")),
      "k?page=2" -> Seq(Right("")))) // empty = past the last page
    val (pages, err) = Fetcher.fetchPaged(f, i => s"k?page=$i", maxPages = 10,
      FetchConfig(pageSleepMs = 500), sleeper = sleeps += _)
    assert(pages == Seq("p0", "p1") && err.isEmpty)
    assert(sleeps == Seq(500L, 500L)) // between page requests only

    // the cap binds even when the server keeps producing pages
    val endless = new Fetcher {
      def fetch(k: String, h: Map[String, String]) = Right("more")
    }
    val (capped, _) = Fetcher.fetchPaged(endless, i => s"p$i", maxPages = 3,
      FetchConfig(pageSleepMs = 0), sleeper = _ => ())
    assert(capped.size == 3)

    // a failing page stops the walk and surfaces the error
    val flaky = new Scripted(Map(
      "q?page=0" -> Seq(Right("p0")), "q?page=1" -> Seq(Left("timeout"))))
    val (partial, stop) = Fetcher.fetchPaged(flaky, i => s"q?page=$i",
      maxPages = 10, FetchConfig(pageSleepMs = 0), sleeper = _ => ())
    assert(partial == Seq("p0") && stop == Some("timeout"))
  }

  test("empty UA pool sends no User-Agent header instead of crashing") {
    var seen: Map[String, String] = null
    val f = new Fetcher {
      def fetch(k: String, h: Map[String, String]) = { seen = h; Right("ok") }
    }
    val r = Fetcher.fetchBatch(f, Seq("A"), noSleep.copy(userAgents = Nil))
    assert(r.landed == Seq("A" -> "ok"))
    assert(seen.isEmpty)
  }

  test("multi-page fixture keys replay every page's content, deterministically") {
    val work = Files.createTempDirectory("fixpages").toString
    Seq(
      ("OX1", """<a href="/properties/123">a</a>"""),
      ("OX1", """<a href="/properties/789">c</a>"""), // second landed page
      ("OX2", """<a href="/properties/456">b</a>"""))
      .toDF("outcode", "html").write.parquet(s"$work/pages")
    val f = Fetcher.FixtureFetcher.fromParquet(
      spark, s"$work/pages", "outcode", "html", Some(Seq("OX1", "OX2")))
    val Right(ox1) = f.fetch("OX1", Map.empty): @unchecked
    assert(ox1.contains("123") && ox1.contains("789")) // no page dropped
    // key filter: unrequested keys are not loaded
    val filtered = Fetcher.FixtureFetcher.fromParquet(
      spark, s"$work/pages", "outcode", "html", Some(Seq("OX2")))
    assert(filtered.fetch("OX1", Map.empty) == Right("")) // absent → empty
  }

  test("pullNewSalesVia: failed fetch leaves watermark stale for natural retry; batch continues") {
    val work = Files.createTempDirectory("fetchjob").toString
    val areasRoot = s"$work/areas"
    val salesRoot = s"$work/sales"
    Seq(
      ("OX1", Some(11L), "Oxford", None: Option[Long]),
      ("OX2", Some(22L), "Oxford2", None: Option[Long]))
      .toDF("outcode", "area_id", "display_name", "last_updated_sale")
      .write.parquet(areasRoot)

    // OX2's fetch fails every attempt; OX1 lands a real page
    val flaky = new Scripted(Map(
      "OX1" -> Seq(Right("""<a href="/properties/123">a</a>""")),
      "OX2" -> Seq(Left("timeout"), Left("timeout"))))
    val r = TaskGraph.run(
      ScrapeJobsHarness.job(flaky, areasRoot, salesRoot, today = 20240610L),
      spark)
    assert(r.succeeded, r.states) // continue-on-error: the job is green
    val sales = new ParquetTable(spark, salesRoot).read()
    assert(sales.select("property_id").as[String].collect().toSeq == Seq("123"))
    val wm = new ParquetTable(spark, areasRoot).read()
      .select("outcode", "last_updated_sale").as[(String, Option[Long])]
      .collect().toMap
    assert(wm("OX1").contains(20240610L)) // landed → advanced
    assert(wm("OX2").isEmpty)             // failed → stale, retried next run

    // next run: only OX2 is still stale; a recovered fetcher lands it
    val recovered = new Scripted(Map(
      "OX2" -> Seq(Right("""<a href="/properties/456">b</a>"""))))
    val r2 = TaskGraph.run(
      ScrapeJobsHarness.job(recovered, areasRoot, salesRoot, today = 20240610L),
      spark)
    assert(r2.succeeded)
    assert(recovered.calls.map(_._1) == Seq("OX2")) // OX1 not refetched
    val wm2 = new ParquetTable(spark, areasRoot).read()
      .select("outcode", "last_updated_sale").as[(String, Option[Long])]
      .collect().toMap
    assert(wm2("OX2").contains(20240610L))
    assert(new ParquetTable(spark, salesRoot).read().count() == 2)
  }
}

/** Tiny indirection so the spec injects a scripted fetcher into the job. */
private object ScrapeJobsHarness {
  def job(f: Fetcher, areasRoot: String, salesRoot: String, today: Long) =
    graft.jobs.ScrapeJobs.pullNewSalesVia(
      (_, _) => f, areasRoot, salesRoot, today, batchAreas = 5,
      cfg = FetchConfig(pageSleepMs = 0, areaSleepMs = 0, retryDelayMs = 0),
      sleeper = _ => ())
}

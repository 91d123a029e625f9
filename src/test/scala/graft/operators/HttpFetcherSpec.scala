package graft.operators

import java.net.InetSocketAddress
import java.util.concurrent.CopyOnWriteArrayList

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives the REAL `java.net.http` connector against a spec-owned
  * localhost server — the live leg of the Fetcher seam, proving
  * timeout enforcement, UA rotation, retry, and the paged walk over an
  * actual socket (no egress required).
  */
class HttpFetcherSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  private val seenUserAgents = new CopyOnWriteArrayList[String]()
  @volatile private var flakyRemainingFailures = 1

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      seenUserAgents.add(ex.getRequestHeaders.getFirst("User-Agent"))
      respond(ex, 200, s"payload:${ex.getRequestURI.getQuery}")
    })
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "gone"))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(3000)
      respond(ex, 200, "too late")
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyRemainingFailures > 0) {
        flakyRemainingFailures -= 1
        respond(ex, 500, "boom")
      } else respond(ex, 200, "recovered")
    })
    server.createContext("/paged", (ex: HttpExchange) => {
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      respond(ex, 200, if (page < 2) s"page-$page" else "")
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def fetcher(cfg: FetchConfig = FetchConfig()) =
    new HttpFetcher(key => s"http://127.0.0.1:$port$key", cfg)

  test("2xx returns the body; non-2xx is Left (a missing page is a FAILURE, not empty)") {
    val f = fetcher()
    assert(f.fetch("/ok?k=1", Map.empty) == Right("payload:k=1"))
    assert(f.fetch("/missing", Map.empty) == Left("http 404"))
  }

  test("timeoutMs is enforced: a slow server surfaces as Left within the bound") {
    val f = fetcher(FetchConfig(timeoutMs = 300))
    val t0 = System.nanoTime()
    val out = f.fetch("/slow", Map.empty)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(out.isLeft && out.swap.getOrElse("").startsWith("timeout"), out)
    assert(elapsedMs < 2500, s"took ${elapsedMs}ms — timeout not enforced")
  }

  test("transport errors never throw: connection refused is Left") {
    // a port with no listener (the server's port is in use; 1 is closed)
    val dead = new HttpFetcher(_ => "http://127.0.0.1:1/nope",
      FetchConfig(timeoutMs = 500))
    assert(dead.fetch("x", Map.empty).isLeft)
  }

  test("fetchBatch over the live connector: UA rotates per request, headers arrive verbatim") {
    seenUserAgents.clear()
    val cfg = FetchConfig(areaSleepMs = 0, userAgents = Seq("ua-A", "ua-B"))
    val r = Fetcher.fetchBatch(fetcher(cfg),
      Seq("/ok?k=a", "/ok?k=b", "/ok?k=c"), cfg, sleeper = _ => ())
    assert(r.landed.map(_._2) ==
      Seq("payload:k=a", "payload:k=b", "payload:k=c"))
    assert(r.failed.isEmpty)
    // global attempt counter rotates the pool across the batch
    assert(seenUserAgents.toArray.toSeq == Seq("ua-A", "ua-B", "ua-A"))
  }

  test("retry discipline over the live connector: 500 then success lands on attempt 2") {
    flakyRemainingFailures = 1
    val cfg = FetchConfig(areaSleepMs = 0, maxRetries = 1)
    val r = Fetcher.fetchBatch(fetcher(cfg), Seq("/flaky"), cfg, sleeper = _ => ())
    assert(r.landed == Seq("/flaky" -> "recovered"))
    // and with retries exhausted the key is recorded, batch continues
    flakyRemainingFailures = 5
    val r2 = Fetcher.fetchBatch(fetcher(cfg), Seq("/flaky", "/ok?k=z"), cfg,
      sleeper = _ => ())
    assert(r2.failed.map(_._1) == Seq("/flaky"))
    assert(r2.landed == Seq("/ok?k=z" -> "payload:k=z"))
  }

  test("paged walk over the live connector stops at the first empty page") {
    val cfg = FetchConfig(pageSleepMs = 0)
    val (pages, err) = Fetcher.fetchPaged(fetcher(cfg),
      p => s"/paged?page=$p", maxPages = 10, cfg, sleeper = _ => ())
    assert(pages == Seq("page-0", "page-1") && err.isEmpty)
  }
}

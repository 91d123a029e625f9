package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Network-backed [[Fetcher]] on `java.net.http` (JDK built-in — no
  * dependency): the live-connector leg of the seam the scrape DAGs
  * need (reference fetch loop: `pull_new_sales_list.py:20-33,105-119`),
  * proving the trait's contract end to end against a real socket
  * (FetcherSpec drives it at a localhost HTTP server; the sandbox has
  * no egress, and none is needed to exercise timeout/retry/UA
  * semantics).
  *
  * Contract points, explicit:
  *  - `cfg.timeoutMs` IS enforced — as the connect timeout on the
  *    shared client and the per-request response timeout; a slow
  *    server surfaces as Left(timeout) within ~timeoutMs, which
  *    [[Fetcher.fetchBatch]]'s retry/continue-on-error discipline then
  *    handles like any other failure.
  *  - headers (the rotating User-Agent from the batch loop) are sent
  *    verbatim on each request.
  *  - 2xx → Right(body); any other status → Left("http <code>") —
  *    including 404, matching the reference's treatment of a missing
  *    page as a fetch failure (key retried next run), NOT an empty
  *    result. Empty-result semantics belong to the page CONTENT
  *    (zero extractable rows), which parsing decides downstream.
  *  - transport errors (refused, reset, timeout) → Left(message);
  *    never throws.
  *
  * One client instance per fetcher: connection pooling across the
  * (driver-side, politeness-serialized) batch walk.
  *
  * @param keyToUrl maps a work key (outcode, property id, page token)
  *   to the URL to fetch — the reference builds these with
  *   station/outcode interpolation; the mapping is caller territory.
  */
final class HttpFetcher(
    keyToUrl: String => String,
    cfg: FetchConfig = FetchConfig()) extends Fetcher {

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(cfg.timeoutMs.toLong))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def fetch(key: String,
      headers: Map[String, String]): Either[String, String] =
    try {
      val builder = HttpRequest.newBuilder(URI.create(keyToUrl(key)))
        .timeout(Duration.ofMillis(cfg.timeoutMs.toLong))
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"http ${resp.statusCode()}")
    } catch {
      case e: java.net.http.HttpTimeoutException =>
        Left(s"timeout after ${cfg.timeoutMs}ms: ${e.getMessage}")
      case scala.util.control.NonFatal(e) =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

package graft.orchestration

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** S12 — concrete webhook/notification sink, the engine's analogue of
  * the reference's Discord helper (`dags/initial_price_paid_data.py:
  * 31-35`): POST a JSON body `{"content": message}` and swallow every
  * error — a notification failure must never fail the pipeline.
  *
  * Driver-side only by design: notifications fire from job/task
  * completion hooks on the driver, never inside executors (one POST per
  * pipeline event, not per row — nothing here scales with data volume).
  */
object WebhookNotify {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5))
    .build()

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** POST `{"content": message}` to `url`. Returns the HTTP status, or
    * None on any error (swallowed, logged to stderr — same contract as
    * the reference's try/except-print).
    */
  def post(url: String, message: String): Option[Int] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(10))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"content": "${esc(message)}"}""", StandardCharsets.UTF_8))
        .build()
      Some(client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode())
    } catch {
      case e: Throwable =>
        System.err.println(s"[webhook] notification failed: ${e.getMessage}")
        None
    }

  /** Adapter for the jobs' `notify: String => Unit` seam. */
  def notifier(url: String): String => Unit = msg => { post(url, msg); () }

  /** Adapter for TaskGraph's W4 `onFailure` hook — message format
    * mirrors the reference's `on_failure` callback.
    */
  def onFailure(url: String, dagId: String): (String, Throwable) => Unit =
    (taskId, _) => { post(url, s"DAG `$dagId` task `$taskId` failed!"); () }
}

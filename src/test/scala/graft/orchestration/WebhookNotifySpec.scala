package graft.orchestration

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

class WebhookNotifySpec extends AnyFunSuite {

  private def withServer(f: (String, () => (String, String)) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var body = ""
    @volatile var contentType = ""
    server.createContext("/hook", ex => {
      body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      contentType = ex.getRequestHeaders.getFirst("Content-Type")
      ex.sendResponseHeaders(204, -1)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook",
      () => (body, contentType))
    finally server.stop(0)
  }

  test("post sends {content: message} JSON with escapes") {
    withServer { (url, seen) =>
      assert(WebhookNotify.post(url, "load \"complete\"\nline2").contains(204))
      val (body, ct) = seen()
      assert(body == """{"content": "load \"complete\"\nline2"}""")
      assert(ct == "application/json")
    }
  }

  test("errors are swallowed: unreachable target returns None, never throws") {
    assert(WebhookNotify.post("http://127.0.0.1:1/hook", "x").isEmpty)
    assert(WebhookNotify.post("not a url", "x").isEmpty)
  }

  test("onFailure hook formats the reference's failure message") {
    withServer { (url, seen) =>
      WebhookNotify.onFailure(url, "initial_price_paid_data")("load_data",
        new RuntimeException("boom"))
      val (body, _) = seen()
      assert(body ==
        """{"content": "DAG `initial_price_paid_data` task `load_data` failed!"}""")
    }
  }

  test("registry builtins wire webhook_url into the notify seam") {
    withServer { (url, seen) =>
      JobRegistry.registerBuiltins()
      val tasks = JobRegistry.get("initial_price_paid_data").get(
        Map("csv_path" -> "/nonexistent.csv", "table_root" -> "/tmp/x",
          "webhook_url" -> url))
      // the notify task is the graph's last node; run just its body
      val notifyTask = tasks.last
      notifyTask.run(TaskGraph.TaskContext(
        graft.TestSession.spark, "r1", "/tmp/graft_wh_stage", Map.empty))
      val (body, _) = seen()
      assert(body.contains("initial price paid load complete"))
    }
  }
}

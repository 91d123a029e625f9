package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.EventStreams.{SessionEvent, SessionOut}

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionization: gap splits, timeout flushes via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = EventStreams.sessionStream(mem.toDS(), "10 minutes", gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    val t = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two events 5 min apart (one session), then a 2h gap event
    mem.addData(SessionEvent(1L, t(10, 0), 1.0), SessionEvent(1L, t(10, 5), 2.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(1L, t(12, 30), 5.0)) // closes session 1 inline
    q.processAllAvailable()
    // advance watermark far past session 2's horizon to force the timeout
    mem.addData(SessionEvent(2L, t(23, 0), 9.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, t(23, 1), 1.0))
    q.processAllAvailable()

    val rows = spark.table("sessions").as[SessionOut].collect()
    val u1 = rows.filter(_.user_id == 1L)
    assert(u1.exists(s => s.n_events == 2 && s.session_value == 3.0),
      s"expected closed first session, got ${rows.toSeq}")
    val first = u1.find(_.n_events == 2).get
    assert(first.session_start_us == t(10, 0).getTime * 1000L)
    // the 12:30 single-event session flushed by the 23:00 watermark advance
    assert(u1.exists(s => s.n_events == 1 && s.session_value == 5.0),
      s"expected timed-out session, got ${rows.toSeq}")
    q.stop()
  }
}

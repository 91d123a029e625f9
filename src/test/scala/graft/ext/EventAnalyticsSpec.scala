package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, when) => (u, t, ts(when)) }
      .toDF("user_id", "event_type", "ts")

  test("orderedFunnel: hand-computed depths, strict ordering, earliest anchoring") {
    val events = ev(
      // u1 completes in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // u2: click BEFORE the first view — funnel stops at view
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      // u3: no view at all — excluded entirely
      (3L, "click", "2024-01-01 10:00:00"),
      // u4: two views; the EARLIEST anchors, later click still counts
      (4L, "view", "2024-01-01 08:00:00"),
      (4L, "view", "2024-01-01 12:00:00"),
      (4L, "click", "2024-01-01 09:00:00"))
    val out = EventAnalytics.orderedFunnel(events,
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Any]("step1_us"), r.getLong(r.fieldIndex("funnel_depth"))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L)._2 == 3L)
    assert(out(2L)._2 == 1L && out(2L)._1 == null) // pre-view click ignored
    assert(out(4L)._2 == 2L) // 09:00 click is after the 08:00 view
  }

  test("orderedFunnel: greedy min-after-min matches an order-scan on real data") {
    // reference semantics computed per user by an in-memory scan
    val events = graft.core.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val steps = Seq("view", "click", "purchase")
    val expected = events.groupBy(_._1).flatMap { case (u, rows) =>
      var bound = Long.MinValue
      var depth = 0L
      var broke = false
      for (step <- steps if !broke) {
        val cand = rows.filter(r => r._2 == step &&
          (if (depth == 0) true else r._3 > bound))
        if (cand.isEmpty) broke = true
        else { bound = cand.map(_._3).min; depth += 1 }
      }
      if (depth > 0) Some(u -> depth) else None
    }
    val got = EventAnalytics.orderedFunnel(
        graft.core.Tables.events(spark, sf0001),
        "user_id", "ts", "event_type", steps)
      .select("user_id", "funnel_depth").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("orderedFunnelSkewed == orderedFunnel on a planted 10%-power-user fixture") {
    // 30 regular users with LCG event streams + ONE power user holding
    // ~12% of all events — the skew regime the salted-agg variant exists
    // for. Equality must be row-identical including null step patterns.
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 16 }
    val types = Array("view", "click", "purchase", "other")
    val base = 1700000000000000L
    val regular = (1L to 30L).flatMap { u =>
      (0 until 20).map { _ =>
        (u, types((next() % 4).abs.toInt), base + (next() % 86400000000L).abs)
      }
    }
    val power = (0 until 80).map { _ =>
      (999L, types((next() % 4).abs.toInt), base + (next() % 86400000000L).abs)
    }
    val events = (regular ++ power).map { case (u, t, us) =>
      val ts = new Timestamp(us / 1000L)
      ts.setNanos(((us % 1000000L) * 1000L).toInt)
      (u, t, ts)
    }.toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val cols = Seq("user_id", "step0_us", "step1_us", "step2_us", "funnel_depth")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(i => r.get(i)).toSeq).toSet
    val window = EventAnalytics.orderedFunnel(events,
      "user_id", "ts", "event_type", steps)
    val salted = EventAnalytics.orderedFunnelSkewed(events,
      "user_id", "ts", "event_type", steps, saltN = 8)
    assert(canon(salted) === canon(window))
    assert(canon(salted).exists(_.head == 999L), "power user present")
  }

  test("orderedFunnelSkewed plan: partial aggregation + salted equi-joins, no window over events") {
    val events = graft.core.Tables.events(spark, sf0001)
    val p = EventAnalytics.orderedFunnelSkewed(events,
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    // the skew defense in the plan: every per-user min is a two-phase
    // hash aggregate (map-side combine collapses the hot user's events
    // before the Exchange)...
    assert(p.contains("partial_min"),
      "per-step minima must partial-aggregate map-side")
    // ...the bound reaches events through salted EQUI-joins (never a
    // window over the raw event partition, never a nested loop)
    assert(!p.contains("Window"), "no window over raw events")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("__salt"), "salted join key present")
  }

  test("retentionCohorts: hand-computed weeks; pre-signup activity excluded") {
    val events = ev(
      // u1 signs up in week w, active in w and w+1
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-10 10:00:00"),
      // u2 signs up same week, only active that week — and has a
      // PRE-signup event that must not create a negative offset
      (2L, "view", "2023-12-25 10:00:00"),
      (2L, "signup", "2024-01-03 10:00:00"),
      // u3 never signs up — not in any cohort
      (3L, "view", "2024-01-01 10:00:00"))
    val out = EventAnalytics.retentionCohorts(events,
        "user_id", "ts", "event_type", "signup")
      .select("cohort_week", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSet
    // 2024-01-01 = epoch day 19723 → week 2817; 01-10 → week 2818
    assert(out == Set((2817L, 0L, 2L), (2817L, 1L, 1L)), out.toString)
  }

  test("windowedFunnel: later anchor converts when the earliest times out") {
    val T = 3600L * 1000000 // 1 hour
    val events = ev(
      // u1: first view's chain exceeds the window; second view's fits —
      // the single-anchor recurrence would miss this conversion
      (1L, "view", "2024-01-01 08:00:00"),
      (1L, "click", "2024-01-01 08:30:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      (1L, "click", "2024-01-01 11:10:00"),
      (1L, "purchase", "2024-01-01 11:20:00"),
      // u2: in-order events but purchase past the 1h window — no row
      (2L, "view", "2024-01-01 08:00:00"),
      (2L, "click", "2024-01-01 08:10:00"),
      (2L, "purchase", "2024-01-01 09:30:00"),
      // u3: two converting anchors (both views complete in window)
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-01 10:05:00"),
      (3L, "click", "2024-01-01 10:10:00"),
      (3L, "purchase", "2024-01-01 10:20:00"))
    val out = EventAnalytics.windowedFunnel(events,
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"), T)
      .select("user_id", "first_anchor_us", "n_converting_anchors")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 3L), out.toString)
    assert(out(1L)._1 == ts("2024-01-01 11:00:00").getTime * 1000)
    assert(out(3L)._2 == 2L) // both anchors convert
    // u2 correctly absent: 09:30 purchase is past 09:00
  }

  test("windowedFunnel: greedy-per-anchor equals exhaustive chain search on real data") {
    val T = 6L * 3600 * 1000000
    val steps = Seq("view", "click", "purchase")
    val raw = graft.core.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exhaustive reference: anchor converts iff ANY (c, p) chain fits
    val expected = raw.groupBy(_._1).flatMap { case (u, rows) =>
      def of(t: String) = rows.filter(_._2 == t).map(_._3).sorted
      val conv = of("view").filter { v =>
        of("click").exists(c => c > v && c <= v + T &&
          of("purchase").exists(p => p > c && p <= v + T))
      }
      if (conv.nonEmpty) Some(u -> (conv.min, conv.size.toLong)) else None
    }
    val got = EventAnalytics.windowedFunnel(
        graft.core.Tables.events(spark, sf0001),
        "user_id", "ts", "event_type", steps, T)
      .select("user_id", "first_anchor_us", "n_converting_anchors")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("eventTransitions: hand-computed pairs; per-user streams never mix") {
    val events = Seq(
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (1L, 11L, "click", ts("2024-01-01 10:01:00")),
      (1L, 12L, "view", ts("2024-01-01 10:02:00")),
      (2L, 20L, "view", ts("2024-01-01 10:00:30")), // between u1's events
      (2L, 21L, "purchase", ts("2024-01-01 10:03:00")),
      (3L, 30L, "signup", ts("2024-01-01 09:00:00"))) // lone event: no pair
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.eventTransitions(events,
        "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("view", "click", 1L), ("click", "view", 1L),
      ("view", "purchase", 1L)), out.toString)
  }

  test("attribution: hand-computed first/last/linear credits with lookback exclusion") {
    val events = Seq(
      // u1: clicks at 09:01 (id 1), 09:30 (id 2), purchase 10.00 at 10:00
      (1L, 1L, "click", ts("2024-01-01 09:01:00"), None),
      (1L, 2L, "click", ts("2024-01-01 09:30:00"), None),
      (1L, 3L, "purchase", ts("2024-01-01 10:00:00"), Some(10.0)),
      // u1: click EXACTLY at purchase − 1h: the lookback lower bound
      // is strict (t > c − L), so the boundary touch is excluded
      (1L, 4L, "click", ts("2024-01-01 09:00:00"), None),
      // u2: purchase with no touch in window → no attribution rows
      (2L, 5L, "purchase", ts("2024-01-01 10:00:00"), Some(5.0)))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = EventAnalytics.attribution(events, "user_id", "ts",
        "event_type", "value", "event_id", "click", "purchase",
        lookbackUs = 3600L * 1000000)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("first_touch", 1L) -> ((10000000L, 1L)),
      ("last_touch", 2L) -> ((10000000L, 1L)),
      ("linear", 1L) -> ((5000000L, 1L)),
      ("linear", 2L) -> ((5000000L, 1L))))
  }

  test("attribution: linear split is half-up in micro-units; remainder stays with the division") {
    // one purchase of 10.00 split across 3 touches:
    // (2·10000000 + 3) div 6 = 3333333 each → total 9999999 (< value
    // by 1 µ-unit — deterministic, replayed identically by the oracle)
    val events = Seq(
      (1L, 1L, "click", ts("2024-01-01 09:00:00"), None),
      (1L, 2L, "click", ts("2024-01-01 09:10:00"), None),
      (1L, 3L, "click", ts("2024-01-01 09:20:00"), None),
      (1L, 4L, "purchase", ts("2024-01-01 10:00:00"), Some(10.0)))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val lin = EventAnalytics.attribution(events, "user_id", "ts",
        "event_type", "value", "event_id", "click", "purchase",
        lookbackUs = 86400L * 1000000)
      .filter($"model" === "linear")
      .as[(String, Long, Long, Long)].collect().map(_._3)
    assert(lin.toSeq == Seq(3333333L, 3333333L, 3333333L))
  }

  test("attribution: simultaneous touches break first/last ties by event_id") {
    val t0 = ts("2024-01-01 09:00:00")
    val events = Seq(
      (1L, 7L, "click", t0, None), (1L, 8L, "click", t0, None),
      (1L, 9L, "purchase", ts("2024-01-01 09:30:00"), Some(2.0)))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = EventAnalytics.attribution(events, "user_id", "ts",
        "event_type", "value", "event_id", "click", "purchase",
        lookbackUs = 3600L * 1000000)
      .as[(String, Long, Long, Long)].collect()
      .filter(r => r._1 != "linear").map(r => r._1 -> r._2).toMap
    assert(out == Map("first_touch" -> 7L, "last_touch" -> 8L))
  }

  test("funnel plan: one user-keyed Exchange serves windows AND the reduction") {
    val p = EventAnalytics.orderedFunnel(
        graft.core.Tables.events(spark, sf0001),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"funnel should shuffle once, saw $exchanges:\n$p")
  }
}

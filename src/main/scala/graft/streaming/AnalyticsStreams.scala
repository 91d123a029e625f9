package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of [[graft.ext.EventAnalytics]] — the ordered funnel
  * (q106) and retention cohorts (q107) as INCREMENTAL computations over
  * an event stream, via `flatMapGroupsWithState` keyed on the user.
  *
  * Exactness contract: both operators reproduce their batch twin
  * bit-exactly on any stream whose late data respects the watermark.
  * The trick is watermark-FINALIZED folding: events buffer in per-user
  * state until the event-time watermark passes them, then fold into the
  * running result in global timestamp order — so the order-sensitive
  * recurrences (funnel min-after-min; first-anchor cohort) see exactly
  * the sequence the batch operator sorts. Events arriving later than
  * the watermark allows are dropped, which is the watermark contract,
  * not a divergence.
  *
  * Scale shape: per-user state is step timestamps / week sets plus the
  * ≤ watermark-horizon event buffer — NEVER the full event history; a
  * power user costs the buffer bound, not their lifetime volume. One
  * hash Exchange on the user key serves the whole operator (the same
  * single-shuffle shape as the batch plan), and eviction is by
  * event-time timeout, so state is bounded at any stream length.
  */
object AnalyticsStreams {

  /** Input event (shared by both operators). */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** Exact µs since epoch (Timestamp.getTime alone truncates to ms —
    * the batch twin's `unix_micros` keeps µs, so we must too).
    */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  // ── ordered funnel ────────────────────────────────────────────────

  /** Per-user funnel state: buffered not-yet-final events + acquired
    * step timestamps (µs; -1 = step not reached). `lastFoldedUs` pins
    * the order invariant — a buffered event older than it is late
    * beyond the watermark and is dropped.
    */
  final case class FunnelState(pendingUs: Seq[Long], pendingStep: Seq[Int],
      stepUs: Seq[Long], lastFoldedUs: Long, maxSeenUs: Long)

  /** Final funnel row per user (emitted once, when the watermark passes
    * the user's last event): step timestamps with -1 for unreached
    * steps — the batch twin's nulls, sentinel-coded so the comparison
    * is encoder-trivial — and the completed depth.
    */
  final case class FunnelOut(user_id: Long, step_us: Seq[Long],
      funnel_depth: Long)

  /** Streaming [[graft.ext.EventAnalytics.orderedFunnel]]: same
    * min-after-min recurrence (step i = earliest `steps(i)` event
    * strictly after step i−1), folded incrementally as the watermark
    * finalizes events. Emits ONE row per user that reached step 0,
    * when their state times out — Append-mode-clean: nothing is ever
    * retracted.
    *
    * `idleTimeoutMs` is the funnel-closure horizon: a user's funnel
    * finalizes once the watermark passes their last event by this much
    * (the product-analytics "session of engagement" dial — an event
    * arriving after closure starts a FRESH funnel). Equality with the
    * batch twin over a finite stream therefore requires the horizon to
    * exceed every within-user event gap; the spec uses one larger than
    * the whole data span. It must NOT be unbounded: it is exactly what
    * lets state for departed users evict.
    */
  def funnelStream(events: Dataset[UserEvent], steps: Seq[String],
      watermark: String, idleTimeoutMs: Long): Dataset[FunnelOut] = {
    require(idleTimeoutMs > 0, "idle timeout must be positive")
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.length

    def fold(stepUs: Array[Long], ripe: Seq[(Long, Int)]): Unit =
      ripe.foreach { case (us, si) =>
        // ascending fold: the first eligible event IS the minimum
        if (stepUs(si) == -1L &&
            (si == 0 || (stepUs(si - 1) != -1L && us > stepUs(si - 1))))
          stepUs(si) = us
      }

    def out(user: Long, stepUs: Array[Long]): Iterator[FunnelOut] =
      if (stepUs(0) == -1L) Iterator.empty
      else Iterator(FunnelOut(user, stepUs.toSeq,
        stepUs.count(_ != -1L).toLong))

    def update(user: Long, rows: Iterator[UserEvent],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val stepUs = s.stepUs.toArray
        // timeout fired ⇒ watermark passed maxSeenUs ⇒ everything
        // buffered is final; fold the remainder and emit
        fold(stepUs, s.pendingUs.zip(s.pendingStep)
          .filter(_._1 > s.lastFoldedUs).sortBy(identity))
        return out(user, stepUs)
      }
      val prev = state.getOption.getOrElse(
        FunnelState(Nil, Nil, Seq.fill(n)(-1L), Long.MinValue, Long.MinValue))
      val incoming = rows.flatMap(e =>
        stepIdx.get(e.event_type).map(si => (micros(e.ts), si))).toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = prev.pendingUs.zip(prev.pendingStep) ++ incoming
      val (ripe, still) = all.partition(_._1 <= wmUs)
      val stepUs = prev.stepUs.toArray
      // beyond-watermark late events (older than the fold frontier)
      // are dropped inside fold's eligibility check order; sort makes
      // the remainder ascending = batch order
      fold(stepUs, ripe.filter(_._1 > prev.lastFoldedUs).sortBy(identity))
      val maxSeen = (prev.maxSeenUs +: all.map(_._1)).max
      state.update(FunnelState(still.map(_._1), still.map(_._2),
        stepUs.toSeq, math.max(prev.lastFoldedUs, wmUs), maxSeen))
      // closure = last event + idle horizon (NOT +1ms: the watermark
      // races ahead of any user with a between-batches gap, and a
      // premature timeout would finalize mid-funnel and restart them);
      // clamped strictly above the watermark, which Spark requires
      state.setTimeoutTimestamp(
        math.max(Math.floorDiv(maxSeen, 1000L) + idleTimeoutMs,
          state.getCurrentWatermarkMs() + 1L))
      Iterator.empty
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  // ── retention cohorts ─────────────────────────────────────────────

  /** Per-user retention state: event buffer + the cohort week (-1
    * unset), activity weeks seen before the cohort was known, and the
    * week offsets already emitted (sets bounded by distinct WEEKS, not
    * events).
    */
  final case class RetentionState(pendingUs: Seq[Long],
      pendingAnchor: Seq[Boolean], cohortWeek: Long, preWeeks: Seq[Long],
      emittedOffsets: Seq[Long], lastFoldedUs: Long, maxSeenUs: Long)

  /** One finalized (user, cohort_week, week_offset) membership —
    * emitted exactly once, so a downstream count per (cohort_week,
    * week_offset) equals the batch operator's `countDistinct(user)`.
    */
  final case class RetentionOut(user_id: Long, cohort_week: Long,
      week_offset: Long)

  /** Streaming [[graft.ext.EventAnalytics.retentionCohorts]]: cohort =
    * epoch-week of the user's first `anchorType` event (ascending fold
    * ⇒ first folded anchor is the minimum); every activity week ≥ the
    * cohort week emits one membership row. Same integer epoch-week
    * arithmetic as the batch twin (⌊⌊µs/86400e6⌋/7⌋, floor division).
    */
  def retentionStream(events: Dataset[UserEvent], anchorType: String,
      watermark: String, idleTimeoutMs: Long): Dataset[RetentionOut] = {
    require(idleTimeoutMs > 0, "idle timeout must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    def weekOf(us: Long): Long =
      Math.floorDiv(Math.floorDiv(us, 86400000000L), 7L)

    def drain(user: Long, st: RetentionState,
        ripe: Seq[(Long, Boolean)]): (RetentionState, List[RetentionOut]) = {
      var cohort = st.cohortWeek
      var pre = st.preWeeks.toSet
      var emitted = st.emittedOffsets.toSet
      val outs = List.newBuilder[RetentionOut]
      def tryEmit(week: Long): Unit =
        if (cohort != -1L && week >= cohort &&
            !emitted.contains(week - cohort)) {
          emitted += week - cohort
          outs += RetentionOut(user, cohort, week - cohort)
        }
      ripe.foreach { case (us, isAnchor) =>
        val w = weekOf(us)
        if (isAnchor && cohort == -1L) {
          cohort = w // ascending fold: first anchor = min anchor ts
          pre.foreach(tryEmit)
          pre = Set.empty
        }
        if (cohort == -1L) pre += w else tryEmit(w)
      }
      (st.copy(cohortWeek = cohort, preWeeks = pre.toSeq.sorted,
        emittedOffsets = emitted.toSeq.sorted), outs.result())
    }

    def update(user: Long, rows: Iterator[UserEvent],
        state: GroupState[RetentionState]): Iterator[RetentionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val rest = s.pendingUs.zip(s.pendingAnchor)
          .filter(_._1 > s.lastFoldedUs).sortBy(_._1)
        return drain(user, s, rest)._2.iterator
      }
      val prev = state.getOption.getOrElse(
        RetentionState(Nil, Nil, -1L, Nil, Nil, Long.MinValue, Long.MinValue))
      val incoming = rows.map(e =>
        (micros(e.ts), e.event_type == anchorType)).toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val all = prev.pendingUs.zip(prev.pendingAnchor) ++ incoming
      val (ripe, still) = all.partition(_._1 <= wmUs)
      val (folded, outs) = drain(user, prev,
        ripe.filter(_._1 > prev.lastFoldedUs).sortBy(_._1))
      val maxSeen = (prev.maxSeenUs +: all.map(_._1)).max
      state.update(folded.copy(pendingUs = still.map(_._1),
        pendingAnchor = still.map(_._2),
        lastFoldedUs = math.max(prev.lastFoldedUs, wmUs),
        maxSeenUs = maxSeen))
      // same idle-horizon closure as funnelStream: memberships are
      // append-final as emitted, so an early eviction only risks
      // splitting a user's cohort on re-arrival — the horizon is the
      // eviction/correctness dial
      state.setTimeoutTimestamp(
        math.max(Math.floorDiv(maxSeen, 1000L) + idleTimeoutMs,
          state.getCurrentWatermarkMs() + 1L))
      outs.iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and retention-cohort analytics over an event stream
  * — the two classic product-analytics operators (the Amplitude/
  * Mixpanel core) expressed as single-shuffle Spark plans.
  *
  * Scale shape: both operators key every stage on the user column, so
  * ONE hash partitioning serves the whole plan — the stacked funnel
  * windows use unbounded-frame `min` (no per-partition sort of the
  * event list), and the per-user reduction that follows reuses the
  * window's partitioning (Catalyst sees the distribution satisfied —
  * no second Exchange; plan-pinned). Per-user state is a handful of
  * timestamps, never a collected event list, so a power user with
  * millions of events costs no more memory than a one-event user.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: for each user, step i's timestamp is the
    * MINIMUM event time of `steps(i)` that falls strictly after step
    * i−1's timestamp (step 0 is unconstrained). Emits one row per
    * user that completed at least step 0: the step timestamps (µs
    * since epoch, null once the funnel breaks) and `funnel_depth`.
    *
    * The min-after-min recurrence is the standard exact semantics
    * ("earliest conversion"): greedily anchoring each step at its
    * earliest valid time never misses a completion — any valid
    * ordered assignment implies the greedy one exists.
    */
  def orderedFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val us = unix_micros(col(tsCol))
    // each step's window min references the PREVIOUS step's
    // materialized column (window functions can't nest in one
    // projection); every window shares the user partitioning, so the
    // stack still costs one Exchange
    val stacked = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val eligible =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && us > col(s"step${i - 1}_us")
        df.withColumn(s"step${i}_us", min(when(eligible, us)).over(w))
    }
    val depth = steps.indices
      .map(i => when(col(s"step${i}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    stacked
      .filter(col("step0_us").isNotNull)
      .groupBy(col(userCol))
      .agg(first(col("step0_us")).as("step0_us"),
        (1 until steps.length).map(i =>
          first(col(s"step${i}_us")).as(s"step${i}_us")) :+
          first(depth).as("funnel_depth"): _*)
  }

  /** Skew-robust [[orderedFunnel]] — identical semantics and output,
    * different physical shape for the power-user regime (one user
    * holding a macroscopic fraction of all events). The window form
    * ships EVERY event of a user to one task (WindowExec cannot split
    * a partition; AQE's skew handling only splits joins), so a 10 %
    * power user makes one straggler task carry 10 % of the corpus.
    * Here each step is a partial-aggregating `groupBy(user).min`
    * instead: map-side combine collapses a user's events to one row
    * PER PARTITION before any shuffle, so the hot user costs one row ×
    * partitions, not their event count. The step-(i−1) bound reaches
    * step i's events through [[graft.operators.SkewJoin.salted]] —
    * the per-user bound row replicates `saltN` ways and the hot user's
    * probe events spread across `saltN` tasks.
    *
    * Cost: N−1 joins + N aggregations (vs one window stack) — pay it
    * when a hot key dominates; the results are row-identical
    * (spec-pinned on a planted 10 %-power-user fixture, oracle-pinned
    * as q115 against q106's DuckDB twin).
    */
  def orderedFunnelSkewed(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], saltN: Int = 8): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = unix_micros(col(tsCol))
    def ofType(t: String) = events.filter(col(typeCol) === t)
      .select(col(userCol), us.as("us"))
    // step 0: a plain min agg — partial aggregation is skew-immune
    var cur = ofType(steps.head).groupBy(col(userCol))
      .agg(min(col("us")).as("step0_us"))
    steps.zipWithIndex.tail.foreach { case (step, i) =>
      val bound = cur.select(col(userCol), col(s"step${i - 1}_us"))
        .filter(col(s"step${i - 1}_us").isNotNull)
      val stepMin = graft.operators.SkewJoin
        .salted(ofType(step), bound, Seq(userCol), col("us"), saltN)
        .filter(col("us") > col(s"step${i - 1}_us"))
        .groupBy(col(userCol))
        .agg(min(col("us")).as(s"step${i}_us"))
      cur = cur.join(stepMin, Seq(userCol), "left")
    }
    val depth = steps.indices
      .map(i => when(col(s"step${i}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    cur.withColumn("funnel_depth", depth)
  }

  /** Windowed funnel — EXACT "converted within T" semantics. The
    * q106-style single-anchor recurrence is wrong here: the earliest
    * step-0 event can time out while a later one converts, so every
    * step-0 event is an anchor. Per anchor the chain is greedy
    * (earliest next step maximizes remaining budget — optimal for a
    * fixed anchor), so correctness needs all anchors × greedy chains:
    * N−1 user-keyed join+min rounds, each bounded by the window
    * (events of step i within T of an anchor), never an unbounded
    * cross product. Emits per user the earliest converting anchor and
    * how many anchors convert.
    *
    * Anchor identity is the (user, anchor timestamp) PAIR, not the
    * event row: two step-0 events of one user in the same microsecond
    * collapse into a single anchor (the per-anchor `groupBy(user,
    * anchor_us)` keys on the timestamp), so `n_converting_anchors`
    * counts distinct converting anchor TIMESTAMPS. This is deliberate
    * — duplicate-microsecond anchors share an identical chain (the
    * window and every bound depend only on anchor_us), so counting
    * them separately would just multiply-count one conversion path —
    * and it is the semantics the DuckDB oracle (q107) replays.
    */
  def windowedFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.length >= 2, "windowed funnel needs ≥ 2 steps")
    require(windowUs > 0, "window must be positive")
    val us = unix_micros(col(tsCol))
    def ofType(t: String) = events.filter(col(typeCol) === t)
      .select(col(userCol), us.as("us"))
    val anchors = ofType(steps.head)
      .select(col(userCol), col("us").as("anchor_us"))
      .withColumn("bound_us", col("anchor_us"))
    val chains = steps.tail.foldLeft(anchors) { (acc, step) =>
      acc.join(ofType(step), Seq(userCol))
        .filter(col("us") > col("bound_us") &&
          col("us") <= col("anchor_us") + windowUs)
        .groupBy(col(userCol), col("anchor_us"))
        .agg(min(col("us")).as("bound_us"))
    }
    chains.groupBy(col(userCol))
      .agg(min(col("anchor_us")).as("first_anchor_us"),
        count(lit(1)).as("n_converting_anchors"))
  }

  /** Per-user next-event transition counts (the Markov-chain / path-
    * analysis statistic): one user-keyed window sorts each user's
    * stream once, `lag` pairs consecutive events, and a global hash
    * agg counts (from, to) — at most |types|² output rows. Ties on
    * identical timestamps break deterministically on the event id.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    events
      .select(col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Path mining: frequency census of k-step event-type sequences
    * (consecutive in each user's timeline) — the n-gram extension of
    * [[eventTransitions]] (k = 2) that answers "which 3-click journeys
    * dominate". Same single user-keyed Exchange: the window's k−1
    * `lead`s ride one sort, and the census is a two-level hash agg.
    * Per-user state in the window frame is k rows, never the event
    * list.
    */
  def pathKGrams(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"paths need k >= 2 steps, got $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val steps = (0 until k).map { i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
        .as(s"step_$i")
    }
    events.select(steps: _*)
      .filter(col(s"step_${k - 1}").isNotNull) // window runs off the end
      .groupBy((0 until k).map(i => col(s"step_$i")): _*)
      .agg(count(lit(1)).as("n_paths"))
  }

  /** Retention cohorts: users grouped by the epoch-week of their first
    * `anchorType` event; for each (cohort_week, week_offset ≥ 0) the
    * number of distinct cohort users with ANY event that week.
    * Epoch-week = ⌊days-since-epoch / 7⌋ — pure integer arithmetic,
    * replayable bit-exactly in any engine (the NUMERICS.md rule: no
    * date_trunc dialect seams).
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, anchorType: String): DataFrame = {
    // exact integer division via subtract-the-remainder: a bare
    // double `us / 86400000000.0` can round UP across a boundary for
    // events within ~350 µs of midnight, silently shifting a day —
    // the subtraction makes the numerator an exact multiple, so the
    // division is exact in double for any µs value < 2^53
    def idiv(x: Column, d: Long): Column =
      ((x - pmod(x, lit(d))) / lit(d)).cast("long")
    val week = idiv(idiv(unix_micros(col(tsCol)), 86400000000L), 7L)
    val firstWeek = events
      .filter(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    events
      .select(col(userCol), week.as("activity_week"))
      .join(firstWeek, Seq(userCol))
      .filter(col("activity_week") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        (col("activity_week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Multi-touch attribution: credit each conversion's value to the
    * touch events (e.g. clicks) of the same user inside the lookback
    * window, under the three standard models at once — `first_touch`
    * (earliest touch takes all), `last_touch` (latest takes all),
    * `linear` (equal split). Output: one row per (model, touch event)
    * with the accumulated credit and how many conversions contributed.
    *
    * Numerics (NUMERICS rule 2): credit is fixed-point ×10⁶ BIGINT —
    * the linear split value/n is a small-integer-ratio division that
    * lands on terminating .5 routinely, so it is computed half-up in
    * integers, `(2v + n) div (2n)`; per-conversion remainders stay
    * (deterministically) with the division, so a model's total credit
    * can differ from total value by < n µ-units per conversion —
    * exactly replayable by the oracle.
    *
    * Plan shape: ONE user-keyed equi-join with the time bounds as
    * join residuals (q43's interval shape — never a nested loop),
    * then per-conversion windows over the pair frame (keyed by the
    * conversion id) and one final (model, touch) hash aggregate.
    * Touch-per-conversion fan-out is bounded by the lookback window —
    * the knob a 100 TB deployment tunes. First/last selection orders
    * by (ts, event_id), so ties are deterministic on both engines.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, idCol: String,
      touchType: String, convType: String, lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0)
    val us = unix_micros(col(tsCol))
    val touches = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_id"), us.as("t_us"))
    val convs = events.filter(col(typeCol) === convType &&
        col(valueCol).isNotNull)
      .select(col(userCol), col(idCol).as("conv_id"), us.as("c_us"),
        (col(valueCol).cast("decimal(38,6)") * lit(1000000L))
          .cast("long").as("v_u6"))
    val pairs = convs.join(touches, Seq(userCol))
      .filter(col("t_us") <= col("c_us") &&
        col("t_us") > col("c_us") - lookbackUs)
    val wConv = Window.partitionBy(col("conv_id"))
    val asc = wConv.orderBy(col("t_us").asc, col("touch_id").asc)
    val desc = wConv.orderBy(col("t_us").desc, col("touch_id").desc)
    val ranked = pairs
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("__rn_first", row_number().over(asc))
      .withColumn("__rn_last", row_number().over(desc))
    val firstT = ranked.filter(col("__rn_first") === 1)
      .select(lit("first_touch").as("model"), col("touch_id"),
        col("conv_id"), col("v_u6").as("credit_u6"))
    val lastT = ranked.filter(col("__rn_last") === 1)
      .select(lit("last_touch").as("model"), col("touch_id"),
        col("conv_id"), col("v_u6").as("credit_u6"))
    val linear = ranked
      .select(lit("linear").as("model"), col("touch_id"), col("conv_id"),
        expr("(2 * v_u6 + __n) div (2 * __n)").as("credit_u6"))
    firstT.unionByName(lastT).unionByName(linear)
      .groupBy(col("model"), col("touch_id"))
      .agg(sum(col("credit_u6")).as("credit_u6"),
        count(lit(1)).as("n_conversions"))
  }
}

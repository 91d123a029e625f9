package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.DateCodecs
import graft.operators.{AsOfJoin, Clean, RangeJoin, Upsert, WorkQueue}

/** Relational query surface: one oracle-checked query per operator family
  * in SURVEY §2 (scan/filter/project, cleaning scalars, anti-join upsert,
  * merge-latest, window top-k, join+agg, sort/limit, set ops, JSON, dates,
  * work-queue). Each `queries` entry has a DuckDB-equivalent SQL string in
  * `oracle` with IDENTICAL output column names.
  *
  * Numeric discipline for oracle stability: double sums are accumulated as
  * DECIMAL(18,4) (exact, order-independent) and cast back to double;
  * averages are exact-decimal-sum / count. Plain double sums would differ
  * between engines in the last bits under different summation orders.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val queries: Map[String, Q] = Map(
    // ── Q1: TPC-H Q1 shape — groupBy agg with map-side partial aggregation
    // (SURVEY §2.4; the engine's headline scan+agg). At 100 TB: partial agg
    // per partition, single shuffle on (returnflag, linestatus) = 6 groups.
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // ── Q2: projection + prefix filter (P2/P4) — predicate pushes to scan.
    "q02_filter_prefix" -> { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").startsWith("BU"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // ── Q3: the reference's cleaning scalars (F1/F2/F3/F13) on orders:
    // regex strip, yyyymmdd encoding, lenient cast (coerce-to-null).
    "q03_clean_coerce" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        regexp_replace(col("o_orderpriority"), "[0-9-]", "").as("priority_clean"),
        DateCodecs.yyyymmdd(col("o_orderdate")).as("order_yyyymmdd"),
        expr("try_cast(o_orderstatus AS double)").as("status_num"))
    },

    // ── Q4: insert-ignore upsert = left-anti join (S9/J1). Target = orders
    // before 1997; updates = orders from 1996 on (overlapping year dedups).
    "q04_insert_ignore" -> { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cutT = lit("1997-01-01").cast("timestamp")
      val cutU = lit("1996-01-01").cast("timestamp")
      val target = orders.filter(col("o_orderdate") < cutT)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = orders.filter(col("o_orderdate") >= cutU)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Upsert.insertIgnore(target, updates, Seq("o_orderkey"))
    },

    // ── Q5: merge-by-key latest-wins (S10/J2) — one row per user_id, the
    // most recent event (ts desc, event_id desc tie-break).
    "q05_merge_latest" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("value").as("last_value"))
    },

    // ── Q7: window top-k per group (§2.5 analogue): top-3 orders per
    // customer by totalprice.
    "q07_window_topk" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },

    // ── Q8: multi-way join + agg (J4 generalization): revenue per nation.
    // nation/region are tiny dims → broadcast; the fact join shuffles on
    // keys once, AQE coalesces.
    "q08_join_agg" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // ── Q9: global sort + limit → TakeOrderedAndProject (no full sort).
    "q09_sort_limit" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    },

    // ── Q10: set ops (§2.7): customers who ordered but are not BUILDING.
    "q10_set_except" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      val b = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      o.except(b)
    },

    // ── Q11: string scalar battery (F5/F6 analogues) on part.
    "q11_scalar_strings" -> { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        regexp_extract(col("p_type"), "^(\\S+)", 1).as("type_first"),
        length(col("p_brand")).as("brand_len"))
    },

    // ── Q12: JSON field extraction (F9/F10) from events.props.
    "q12_json_extract" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
    },

    // ── Q13: date_trunc month rollup (F13 family).
    "q13_month_rollup" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("month_total"))
    },

    // ── Q14: yyyymmdd round-trip (F2/F12/F13 — DateCodecs).
    "q14_yyyymmdd_roundtrip" -> { (s, dir) =>
      val enc = DateCodecs.yyyymmdd(col("o_orderdate"))
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        enc.as("order_yyyymmdd"),
        DateCodecs.fromYyyymmdd(enc).as("order_date"))
    },

    // ── Q15: work-queue batch pick (S3/O1/T3): stale-or-never watermark
    // eligibility + deterministic hash-scatter batch of 50.
    "q15_work_queue" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .withColumn("order_yyyymmdd", DateCodecs.yyyymmdd(col("o_orderdate")))
      WorkQueue.hashScatterBatch(
          o, WorkQueue.staleOrNever("order_yyyymmdd", 19960101L), "o_orderkey", 50)
        .select(col("o_orderkey"), col("order_yyyymmdd"))
    },

    // ── Q16: tumbling event-time window agg (§2.9; batch twin of the
    // streaming path in graft.streaming).
    "q16_event_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    },

    // ── Q29: rollup grouping sets (§2.4 "free in Spark" — substantiated).
    "q29_rollup" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ── Q30: distinct aggregation (expand + two-phase agg under the hood).
    "q30_distinct_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    },

    // ── Q31: window frame spec (§2.5): moving 3-row sum per user over
    // event time (ns-precision ordering via the raw long).
    "q31_moving_window" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir).select(
        col("event_id"),
        col("user_id"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          .as("moving_sum"),
        count(lit(1)).over(w).as("n_in_frame"))
    },

    // ── Q37: as-of join (custom operator — Spark has no native as-of):
    // for each click, the user's latest purchase at or before it.
    "q37_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
      AsOfJoin.backward(clicks, purchases,
          key = Seq("user_id"),
          leftTime = col("ts_ns"), rightTime = col("ts_ns"),
          rightCols = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id"), col("asof_value"))
    },

    // ── Q39: range join (point-in-interval) via bin bucketing — events
    // values bucketed into fixed bands; equi-join on bins replaces the
    // BroadcastNestedLoopJoin a raw BETWEEN join would plan.
    "q39_range_join" -> { (s, dir) =>
      val bands = s.range(0, 20).select(
        col("id").as("band_id"),
        (col("id") * 5.0).as("lo"),
        (col("id") * 5.0 + 5.0).as("hi"))
      RangeJoin.pointInInterval(
          Tables.events(s, dir).select(col("event_id"), col("value")),
          bands, "value", "lo", "hi", binWidth = 5.0)
        .select(col("event_id"), col("band_id"))
    },

    // ── Q36: exact quantiles per group (percentile = linear
    // interpolation on sorted values; same definition as DuckDB's
    // quantile_cont).
    "q36_quantiles" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"))
    },

    // ── Q32: sessionization (gaps-and-islands): sessions split on >30 min
    // inactivity per user — lag + running sum of boundaries, then
    // per-session aggregates. Integer ns arithmetic end-to-end (exact).
    "q32_sessionize" -> { (s, dir) =>
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val gapUs = 30L * 60 * 1000000L
      Tables.events(s, dir)
        // µs resolution on both sides: DuckDB 1.0's epoch_ns truncates
        // TIMESTAMP_NS to µs, so the oracle can't see full ns
        .withColumn("ts_us", expr("ts_ns DIV 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byTime))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("session_start_us"),
          dsum(col("value")).as("session_value"))
    },

    // ── Q41: cube grouping sets (§2.4 — the rollup sibling, all 2ᵏ
    // grouping combinations in one pass via Expand).
    "q41_cube" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ── Q42: set intersection (§2.7 — the except sibling, q10's shape).
    "q42_intersect" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      val b = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      o.intersect(b)
    },

    // ── Q43: time-bounded event join — the batch twin of the
    // stream-stream interval join (EventStreams.joinStreams): each click
    // paired with the same user's purchases within the following hour.
    // µs integer time math on both sides (DuckDB truncates TIMESTAMP_NS
    // to µs through epoch_us exactly like Tables.events does for Spark).
    "q43_interval_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"))
      graft.streaming.EventStreams.intervalJoin(
          clicks, "c_ts", purchases, "p_ts",
          col("user_id") === col("p_user"), "1 hour")
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
    },

    // ── Q69: pivot (§2.4 family): long→wide conditional aggregation.
    // Explicit value list, so the plan is ONE pass — a single hash agg
    // whose map-side partials already carry the five pivoted sums; no
    // per-value scan, no distinct-values pre-query (implicit pivot
    // would add a driver round-trip to discover values — at 100 TB the
    // value list must be declared, and here it is).
    "q69_pivot_priority" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderstatus"),
          col("`1-URGENT`").as("urgent"), col("`2-HIGH`").as("high"),
          col("`3-MEDIUM`").as("medium"),
          col("`4-NOT SPECIFIED`").as("notspec"), col("`5-LOW`").as("low"))
    },

    // ── string aggregation (LISTAGG / string_agg parity): per source,
    // the sorted-distinct language roster as one delimited string.
    // Deterministic by sorting BEFORE joining — collect_set order is
    // partition-dependent, array_sort pins it (the only portable way;
    // both engines' bare string_agg order is undefined).
    "q171_string_agg" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(
          concat_ws(",", array_sort(collect_set(col("lang"))))
            .as("langs"),
          countDistinct(col("lang")).as("n_langs"))
    },

    // ── deterministic per-group mode: the most frequent order
    // priority per order status, ties to the lexicographically
    // smallest — built-in mode() is tie-arbitrary on BOTH engines, so
    // the window argmax is the portable formulation (q169's recipe).
    "q172_group_mode" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("c"))
      counts
        .withColumn("rn", row_number().over(Window
          .partitionBy("o_orderstatus")
          .orderBy(col("c").desc, col("o_orderpriority").asc)))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("c").as("n_rows"))
    }
  )

  /** DuckDB oracle SQL — identical semantics AND column names. DuckDB
    * regexp_replace needs the 'g' flag to match Spark's global default.
    */
  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_prefix" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment LIKE 'BU%'",

    "q03_clean_coerce" ->
      """SELECT o_orderkey,
        |  regexp_replace(o_orderpriority, '[0-9-]', '', 'g') AS priority_clean,
        |  CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_yyyymmdd,
        |  TRY_CAST(o_orderstatus AS DOUBLE) AS status_num
        |FROM orders""".stripMargin,

    "q04_insert_ignore" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                         WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')""".stripMargin,

    "q05_merge_latest" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |       value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "q07_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "q08_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q09_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q10_set_except" ->
      """SELECT DISTINCT o_custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "q11_scalar_strings" ->
      """SELECT p_partkey, lower(p_name) AS name_lower,
        |  regexp_extract(p_type, '^(\S+)', 1) AS type_first,
        |  length(p_brand) AS brand_len
        |FROM part""".stripMargin,

    "q12_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,

    "q13_month_rollup" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS month_total
        |FROM orders GROUP BY 1""".stripMargin,

    "q14_yyyymmdd_roundtrip" ->
      """SELECT o_orderkey,
        |  CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_yyyymmdd,
        |  CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS order_date
        |FROM orders""".stripMargin,

    "q15_work_queue" ->
      """SELECT o_orderkey, order_yyyymmdd FROM (
        |  SELECT o_orderkey, CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_yyyymmdd
        |  FROM orders) t
        |WHERE order_yyyymmdd IS NULL OR order_yyyymmdd <= 19960101
        |ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 50""".stripMargin,

    "q16_event_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q29_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q30_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q31_moving_window" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS moving_sum,
        |  COUNT(*) OVER w AS n_in_frame
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q37_asof_join" ->
      """SELECT c.event_id, c.user_id,
        |  p.event_id AS asof_event_id, p.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "q39_range_join" ->
      """SELECT e.event_id, b.band_id
        |FROM events e
        |JOIN (SELECT i AS band_id, i * 5.0 AS lo, i * 5.0 + 5.0 AS hi
        |      FROM generate_series(0, 19) t(i)) b
        |  ON e.value >= b.lo AND e.value < b.hi""".stripMargin,

    "q36_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q41_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q42_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "q43_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM events c
        |JOIN events p ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000""".stripMargin,

    "q69_pivot_priority" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS low
        |FROM orders GROUP BY 1""".stripMargin,

    "q32_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT *, CAST(SUM(CASE WHEN prev_us IS NULL
        |      OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS session_idx
        |  FROM t)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(ts_us) AS session_start_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q171_string_agg" ->
      """SELECT source,
        |  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,

    "q172_group_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n_rows FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    COUNT(*) AS n_rows,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1""".stripMargin
  )
}

package graft.queries

import graft.queries.QueryUtil.Q

/** Extension query surface: the LLM-data-pipeline operators (builder
  * brief) — text analysis, fingerprint dedup, embedding similarity,
  * multimodal codecs, the transactional table, event/graph analytics,
  * and the crawl stack — each oracle-checked against DuckDB where SQL
  * can express it.
  *
  * The registry is COMPOSED from per-tier files (one object per tier,
  * each holding its queries and their oracle SQL side by side):
  * [[ExtDedupQueries]], [[ExtAnnQueries]], [[ExtTextQueries]],
  * [[ExtImageQueries]], [[ExtAvQueries]], [[ExtFormatsQueries]],
  * [[ExtAnalyticsQueries]], [[ExtTxLogQueries]], [[ExtCrawlQueries]].
  * Tier membership is organizational only — names, bodies, and oracle
  * text are the registry members the driver sees, unchanged by the
  * split. Cross-tier oracle REUSE (a codec recovering the same
  * synthetic raster as another, capture-pinned LSH vs exact twins)
  * lives below, where both sides are in scope.
  */
object ExtQueries {

  val queries: Map[String, Q] =
    ExtDedupQueries.queries ++ ExtAnnQueries.queries ++
      ExtTextQueries.queries ++ ExtImageQueries.queries ++
      ExtAvQueries.queries ++ ExtFormatsQueries.queries ++
      ExtAnalyticsQueries.queries ++ ExtTxLogQueries.queries ++
      ExtCrawlQueries.queries

  private val oracleBase: Map[String, String] =
    ExtDedupQueries.oracleBase ++ ExtAnnQueries.oracleBase ++
      ExtTextQueries.oracleBase ++ ExtImageQueries.oracleBase ++
      ExtAvQueries.oracleBase ++ ExtFormatsQueries.oracleBase ++
      ExtAnalyticsQueries.oracleBase ++ ExtTxLogQueries.oracleBase ++
      ExtCrawlQueries.oracleBase


  /** q25 (MinHash LSH near-dups) is oracled against the SAME exact
    * Jaccard SQL as q24: banded LSH at (k=64, b=32, r=2) + exact-Jaccard
    * verify must reproduce the exact all-pairs result at the 0.5
    * threshold (P[candidate | j=0.5] ≈ 0.9999 per pair; deterministic
    * hashing makes the outcome stable, and the driver now checks it).
    *
    * PINNED DEPENDENCY: this equality holds for the CURRENT shingling
    * (trigrams, xxhash64 seed 42 family in MinHashDedup), band shape
    * (b=32, r=2), and driver test data. Any change to those can flip
    * this gate red WITHOUT a real recall regression — per-pair capture
    * at exactly j=0.5 is probabilistic in the hash choice, not certain.
    * If this goes red after touching seeds/shingling/data: diff q24 vs
    * q25 output (symmetric difference) first; a handful of j≈0.5 pairs
    * missing from q25 is an LSH near-threshold miss (re-tune bands or
    * re-pin), whereas extra/wrong pairs or large gaps mean a real bug.
    */
  val oracle: Map[String, String] =
    oracleBase +
      // q149 recovers the SAME synthetic raster as q81 through the BMP
      // codec — identical arithmetic oracle
      ("q149_bmp_pixel_stats" -> oracleBase("q81_png_pixel_stats")) +
      // q161 recovers the SAME synthetic PCM as q82 through the FLAC
      // codec — identical arithmetic oracle
      ("q161_flac_pcm_stats" -> oracleBase("q82_wav_pcm_stats")) +
      // q164 recovers the SAME synthetic raster as q81 through the
      // TIFF codec — identical arithmetic oracle
      ("q164_tiff_pixel_stats" -> oracleBase("q81_png_pixel_stats")) +
      ("q25_minhash_dups" -> oracleBase("q24_ngram_jaccard_dups")) +
      // q50 = the exact pair set restricted to pairs touching the
      // simulated new batch (doc_id ≡ 0 mod 10); same capture pinning
      // as q25 (see that Scaladoc for the triage protocol if red).
      ("q50_incremental_dedup" ->
        s"""SELECT * FROM (${oracleBase("q24_ngram_jaccard_dups")})
           |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin) +
      // q54 = q40's exact pair set restricted the same way (incremental
      // embedding dedup is exact, so this is a value oracle, not a
      // capture-pinned one).
      ("q54_incremental_embedding_neardup" ->
        s"""SELECT * FROM (${oracleBase("q40_embedding_neardup")})
           |WHERE vec_a % 10 = 0 OR vec_b % 10 = 0""".stripMargin) +
      // q79 composes q34's component closure (its final SELECT becomes
      // a CTE) with q18's rounded quality as the ranking key: survivors
      // are each component's argmax-quality member (ties → lowest id),
      // singletons always survive.
      // the SQL-statement twins replay the exact oracles of the API
      // queries they route to — parse/rewrite/execute must be
      // result-identical to the direct TxLogTable calls
      ("q201_sql_txlog_merge" ->
        oracleBase("q119_txlog_merge_conditional")) +
      ("q202_sql_txlog_dml" -> oracleBase("q135_txlog_dml")) +
      ("q203_sql_txlog_time_travel" ->
        oracleBase("q198_txlog_time_travel")) +
      ("q204_sql_txlog_insert" ->
        """SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
          |FROM events WHERE event_id % 3 IN (0, 1)""".stripMargin) +
      // the stats census Catalyst consumes, recomputed from the raw
      // table: exact rows, min/max, null counts through a 2-commit fold
      ("q206_txlog_stats_census" ->
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS event_nulls,
          |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS value_nulls
          |FROM events""".stripMargin) +
      // catalog path: same final set as q204 (overwrite resets, then
      // the %3=1 append lands)
      ("q208_sql_txlog_catalog" ->
        """SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
          |FROM events WHERE event_id % 3 IN (0, 1)""".stripMargin) +
      // DESCRIBE DETAIL restated: v0 create + 2 appends = version 2,
      // two coalesce(1) appends = 2 files, exact rows, base protocol
      ("q209_sql_txlog_detail" ->
        """SELECT CAST(2 AS BIGINT) AS version,
          |  CAST(2 AS BIGINT) AS num_files,
          |  CAST(COUNT(*) AS BIGINT) AS num_rows,
          |  CAST(1 AS BIGINT) AS min_reader
          |FROM events""".stripMargin) +
      // the persistent catalog path: evens + odd multiples of 3 land
      // as inserted; the MERGE doubles odd non-multiples of 3 (all
      // event_ids are distinct, so latest-wins collapses nothing)
      ("q211_txlog_catalog" ->
        """SELECT event_id, user_id,
          |  CAST(CASE WHEN event_id % 2 = 1 AND event_id % 3 <> 0
          |       THEN value * 2 ELSE value END AS DOUBLE) AS value
          |FROM events""".stripMargin) +
      // manifest-stats aggregates: exact census values recomputed by
      // DuckDB from the raw rows (value doubles round-trip the stats
      // encoding exactly)
      ("q212_txlog_stats_agg" ->
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(COUNT(value) AS BIGINT) AS n_values,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(MIN(value) AS DOUBLE) AS min_value,
          |  CAST(MAX(value) AS DOUBLE) AS max_value
          |FROM events""".stripMargin) +
      // grouped manifest census: per-group exact values recomputed by
      // DuckDB from the raw rows (the engine folds them from per-file
      // stats of group-constant files, zero files opened)
      // partitioned DDL + native ingest + census under one hash
      ("q214_partitioned_census" ->
        """SELECT user_id % 4 AS grp,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(MIN(value) AS DOUBLE) AS min_value,
          |  CAST(MAX(value) AS DOUBLE) AS max_value
          |FROM events GROUP BY 1""".stripMargin) +
      // REPLACE WHERE over a DV-bearing snapshot: DuckDB recomputes
      // the point deletes (kept partitions lose their %113 rows) and
      // the swap (grp 1 fully re-seeded ×10, deletes irrelevant)
      ("q216_replace_where" ->
        """WITH base AS (
          |  SELECT user_id % 4 AS grp, event_id, value * 10 AS value
          |  FROM events WHERE user_id % 4 = 1
          |  UNION ALL
          |  SELECT user_id % 4 AS grp, event_id, value
          |  FROM events WHERE user_id % 4 <> 1
          |    AND (event_id % 113 <> 0 OR event_id IS NULL))
          |SELECT grp,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_value
          |FROM base GROUP BY 1""".stripMargin) +
      // hybrid census: the duplicated-union base replays the engine's
      // four group-constant appends + the stats-less straggler append
      // (event_id % 97 rows land twice)
      ("q215_txlog_hybrid_census" ->
        """WITH base AS (
          |  SELECT user_id % 4 AS grp, event_id, value FROM events
          |  UNION ALL
          |  SELECT user_id % 4 AS grp, event_id, value FROM events
          |  WHERE event_id % 97 = 0)
          |SELECT grp,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(COUNT(value) AS BIGINT) AS n_values,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event
          |FROM base GROUP BY 1""".stripMargin) +
      ("q213_txlog_grouped_census" ->
        """SELECT user_id % 4 AS grp,
          |  CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(COUNT(value) AS BIGINT) AS n_values,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(MIN(value) AS DOUBLE) AS min_value
          |FROM events GROUP BY 1""".stripMargin) +
      // avro logical-type round-trip must be invisible to the rollup
      ("q210_avro_logical_types" ->
        """SELECT CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS BIGINT)
          |    AS ship_year,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          |    AS sum_price,
          |  MAX(CAST(l_shipdate AS DATE)) AS max_date,
          |  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ts
          |FROM lineitem GROUP BY 1""".stripMargin) +
      // maintenance statements: zorder rewrite invisible to values;
      // vacuum count = the 2 pre-optimize dirs; history = 4 commits
      ("q207_sql_txlog_maintenance" ->
        """SELECT l_orderkey % 100 AS okey_bucket,
          |  CAST(COUNT(*) AS BIGINT) AS n_items,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty,
          |  CAST(2 AS BIGINT) AS n_removed,
          |  CAST(4 AS BIGINT) AS n_commits
          |FROM lineitem GROUP BY 1""".stripMargin) +
      // dynamic file pruning must be invisible to the join result
      ("q205_txlog_dynamic_pruning" ->
        """SELECT o.o_orderkey, o.o_custkey,
          |  CAST(COUNT(*) AS BIGINT) AS n_lines,
          |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_orderkey % 997 = 1
          |GROUP BY 1, 2""".stripMargin) +
      ("q79_canonical_by_quality" -> {
        val ccAsCte = oracleBase("q34_dedup_closure").replace(
          "SELECT src AS vertex, least(src, MIN(dst)) AS component\nFROM reach GROUP BY src",
          ", comp0 AS (\n  SELECT src AS vertex, least(src, MIN(dst)) AS component\n  FROM reach GROUP BY src)")
        s"""$ccAsCte,
           |q AS (SELECT doc_id, quality FROM (${oracleBase("q18_quality_score")})),
           |f AS (
           |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, q.quality
           |  FROM documents d
           |  LEFT JOIN comp0 c ON c.vertex = d.doc_id
           |  JOIN q ON q.doc_id = d.doc_id),
           |r AS (
           |  SELECT doc_id, row_number() OVER (
           |    PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
           |  FROM f)
           |SELECT doc_id FROM r WHERE rn = 1""".stripMargin
      })
}


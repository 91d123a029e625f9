package graft

import graft.SparkSpec

/** Plan-quality regression gate: the physical-plan properties the
  * 100 TB design depends on, locked in as assertions so an innocent
  * refactor can't silently reintroduce a full scan / global sort /
  * shuffle where one was engineered away.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString

  test("q01: filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_quantity:double"))
    assert(!p.contains("l_orderkey")) // unused columns pruned from scan
    assert(p.contains("partial_sum")) // map-side combine
  }

  test("q02: prefix predicate pushes as StringStartsWith") {
    assert(plan("q02_filter_prefix").contains("StringStartsWith(c_mktsegment,BU)"))
  }

  test("q09: sort+limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q09_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort ["), s"unexpected full sort:\n$p")
  }

  test("q08: dimension joins broadcast") {
    assert(plan("q08_join_agg").contains("BroadcastHashJoin"))
  }

  test("q04: anti-join prunes target to key column only") {
    val p = plan("q04_insert_ignore")
    assert(p.contains("LeftAnti"))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderdate"))
  }

  test("no query plans a CartesianProduct or an unintended BroadcastNestedLoopJoin") {
    // q21 is the deliberate brute-force ANN baseline: a ≤10-row query
    // frame broadcast against the corpus. Work is |Q|·|C| under any
    // plan for an intentional cross product, and a tiny-broadcast BNLJ
    // streams the corpus exactly once — the right plan there, and only
    // there.
    // q45/q27/q35 embed the same brute-force baseline as the reference
    // side of their ANN invariants (optimality bound, recall floors),
    // so they carry the same tiny-side BNLJ — the approx side under
    // test stays bucketed equi-joins.
    // q58/q59/q60 cross-join a SINGLE-ROW aggregate (corpus doc count /
    // vocabulary size / pair counts) into every row — a broadcast of one
    // scalar row, the standard way to fan a global statistic into a
    // distributed frame without collect(). The data joins around them
    // stay keyed equi-joins (pinned by the dedicated plan tests below).
    // q67 fans the single-row total-weight aggregate into the scan the
    // same way (broadcast of one scalar row, then a pure filter).
    // q91 is q21's shape with the near-dup ceiling: the same ≤10-row
    // broadcast brute-force gate leg (the scale path routes ANN
    // candidates through the same filter+rank instead).
    // q95 carries BOTH intentional shapes: its exact reference leg is
    // q21's broadcast brute force, and the ADC scan under test
    // broadcasts the ≤10-row query-table frame against the encoded
    // corpus — per-candidate work is m table lookups, streamed once;
    // that broadcast-the-tiny-side scan IS the PQ search plan.
    // q100's brute-force EXACT leg carries the same tiny-broadcast
    // shape; the IVFADC side under test joins on the cell key.
    val intentionalBnlj = Set("q21_cosine_topk", "q45_ann_upper_bound",
      "q27_ann_lsh_recall_floor", "q35_ann_ivf_recall_floor",
      "q58_tfidf_topk", "q59_bigram_lm_score", "q60_semdedup_invariant",
      "q63_heavy_hitters_superset", "q67_weighted_sample",
      "q91_hard_negatives", "q95_ann_pq_recall_floor",
      "q100_ann_ivfadc_recall_floor",
      // q103 carries q100's exact brute-force reference leg (the same
      // ≤10-row broadcast); the residual-IVFADC side under test joins
      // on the cell key like q100's
      "q103_ann_residual_recall_floor",
      // q114 = q103 + exact re-rank: the BNLJ is again ONLY the exact
      // reference leg; the candidate stage joins on the cell key and
      // the re-rank fetch is a broadcast EQUI-join on cand_id/query_id
      "q114_ann_rerank_recall_floor",
      // q121's BNLJ is the p×p pair expansion of p AGGREGATED sketch
      // rows (p = #sources, 20 at every SF) — the raw corpus was
      // already collapsed by the sketch hash-aggregate; pair math is
      // set operations over kilobytes. The exact leg (the invariant's
      // reference) joins EQUI on token.
      "q121_theta_vocab_overlap",
      // q128 fans the single-row (N, avgdl) corpus-stats aggregate into
      // the per-term score rows — q58/q67's one-scalar-row broadcast
      // shape; the data joins (tf⋈df, tf⋈dl) are keyed equi-joins.
      "q128_bm25_topk",
      // q137 assembles its census row by cross-joining three
      // SINGLE-ROW aggregates (node/wedge stats × edge count ×
      // triangle count) — the q58/q67 one-scalar-row broadcast shape;
      // all DATA joins (orientation, wedges, closing edge) are keyed
      // equi-joins on materialized inputs.
      "q137_triangle_census",
      // q139 fans the SINGLE-ROW basket census into the rule rows
      // (explicit broadcast) — same scalar shape; cooc/degree joins
      // are keyed equi-joins.
      "q139_association_rules",
      // q146 = q27's harness for the SQ8 memory tier: BOTH legs are the
      // deliberate ≤10-row query broadcast (exact reference + the SQ8
      // asymmetric scan under test — streaming the int8 codes once IS
      // the SQ8 search plan; the scale path cell-restricts first).
      "q146_ann_sq8_recall_floor",
      // q147's BNLJ is ONLY the exact brute reference leg (q100's
      // shape); the IVF×SQ8 side under test joins on the cell key.
      "q147_ann_ivf_sq8_recall_floor")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!intentionalBnlj(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("q78: block census computes once — cached frame feeds all dispatch legs") {
    // string-based: AQE's AdaptiveSparkPlanExec exposes no children, so
    // tree collect() sees nothing below it
    val p = plan("q78_entity_match")
    // all four join-side references (small a/b, large a/b) must read the
    // one persisted census frame, not re-scan the source per leg
    val scans = "InMemoryTableScan".r.findAllIn(p).size
    assert(scans >= 4, s"census cache not reused ($scans scans):\n$p")
    // each InMemoryTableScan print embeds the cached relation's child
    // plan (with its census Window); a Window BEYOND those is a leg
    // recomputing the census outside the cache
    val relations = "InMemoryRelation".r.findAllIn(p).size
    val windows = "Window \\[count".r.findAllIn(p).size
    assert(windows == relations,
      s"census recomputed outside the cache ($windows windows, $relations cached relations):\n$p")
  }

  test("q92: boilerplate removal joins ANTI on the line key; reassembly is a hash agg, not a global window") {
    val p = plan("q92_line_dedup")
    assert(p.contains("LeftAnti"), s"q92 lost the anti-join:\n$p")
    assert(!p.contains("Window"), s"q92 reassembly regressed to a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q93/q94: codec kernels stay scan-stage — no joins, no windows") {
    Seq("q93_image_dhash", "q94_audio_frame_energy").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
    }
  }

  test("q40: exact near-dup pairs run as a shuffle equi-join, not a corpus broadcast") {
    val p = plan("q40_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q40 regressed to BNLJ:\n$p")
    assert(p.contains("Join") && (p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin")),
      s"q40 lost its equi-join:\n$p")
  }

  test("q54: incremental embedding dedup is equi-joins only (fragment-replicate, no BNLJ)") {
    val p = plan("q54_incremental_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q54 regressed to a non-equi pair join:\n$p")
  }

  test("q56: decontamination broadcasts the eval side, scans the corpus once") {
    val p = plan("q56_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"q56 lost the eval-side broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q56 BNLJ:\n$p")
  }

  test("q55: PII redaction is a pure scan-stage projection (no shuffle at all)") {
    val p = plan("q55_redact_pii")
    assert(!p.contains("Exchange"), s"q55 gained a shuffle:\n$p")
  }

  test("q57/q58/q59: text-statistics pipelines are hash aggs over gram keys") {
    for (q <- Seq("q57_repetition_stats", "q58_tfidf_topk",
        "q59_bigram_lm_score")) {
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q lost hash aggregation:\n$p")
      // partial aggregation must collapse repeats map-side before the
      // shuffle — the whole scale story of these counters
      assert(p.contains("partial_"), s"$q lost partial (map-side) agg:\n$p")
    }
    // q58's term-dictionary join carries keys (the only BNLJ is the
    // single-row scalar fan-in, allowlisted above)
    val p58 = plan("q58_tfidf_topk")
    assert(p58.contains("SortMergeJoin") || p58.contains("ShuffledHashJoin")
      || p58.contains("BroadcastHashJoin"), s"q58 lost its keyed join:\n$p58")
  }

  test("q60: the within-cell pair join is a keyed equi-join on cell id") {
    val p = plan("q60_semdedup_invariant")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"q60 lost its equi-join:\n$p")
  }

  /** Decode-tier exchange rule (r18): the codec queries may carry AT
    * MOST ONE round-robin compute-spread Exchange (Partitioning
    * .forCompute over the one-split documents table — without it the
    * whole tier's decode CPU serialized onto a single core); any KEYED
    * exchange (hash/range/single-partition) is still a regression of
    * the embarrassingly-parallel contract.
    */
  private def assertSpreadOnly(q: String, p: String): Unit = {
    val all = "Exchange".r.findAllIn(p).size
    val spread = "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    assert(all == spread, s"$q gained a KEYED shuffle:\n$p")
    assert(spread <= 1, s"$q spread more than once:\n$p")
  }

  test("q84/q85/q86: media decode is a per-partition map (compute spread only)") {
    // the entire scale story of the codec queries: embarrassingly
    // parallel decode — at most the one round-robin spread, never a
    // keyed exchange. q86 additionally fuses its two ops (resample →
    // stats) as adjacent MapPartitions in ONE task pipeline.
    for (q <- Seq("q84_jpeg_pixel_stats", "q85_mjpeg_frame_stats",
        "q86_pcm_resample")) {
      val p = plan(q)
      assertSpreadOnly(q, p)
      assert(p.contains("MapPartitions"), s"$q lost its batch stage:\n$p")
    }
    val p86 = plan("q86_pcm_resample")
    assert("MapPartitions".r.findAllIn(p86).size >= 2,
      s"q86 ops no longer fuse as adjacent MapPartitions:\n$p86")
  }

  test("crawl-ingest tier stays scan-stage; frontier schedules in exactly one Exchange") {
    // WARC parse, content extraction, robots, sitemap, links, FLAC,
    // charset: all per-row decode work — a KEYED Exchange anywhere is
    // a regression of the embarrassingly-parallel ingest contract
    // (the single round-robin compute spread is the r18 fix, not a
    // regression — see assertSpreadOnly)
    for (q <- Seq("q154_warc_extract", "q155_main_content",
        "q156_robots_check", "q157_url_frontier", "q158_sitemap_entries",
        "q160_link_extract", "q161_flac_pcm_stats", "q162_charset_decode",
        "q163_ogg_meta", "q164_tiff_pixel_stats", "q165_warc_cdx",
        "q166_pdf_text", "q167_wet_wat", "q170_cdc_chunks",
        "q173_mp3_id3", "q174_exif_meta", "q175_zip_roundtrip",
        "q176_docx_text", "q177_xlsx_cells")) {
      assertSpreadOnly(q, plan(q))
    }
    // the politeness window is the frontier's ONE semantic shuffle
    val p159 = plan("q159_frontier_schedule")
    assert("Exchange".r.findAllIn(p159).size == 1,
      s"q159 must shuffle exactly once (domain window):\n$p159")
  }

  test("q87/q89: extraction and compression signals are pure scan stages") {
    for (q <- Seq("q87_html_extract", "q89_compression_signal")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q gained a shuffle:\n$p")
    }
  }

  test("q88: BPE pair stats = two partial-agg shuffles + distributed top-k (no single-partition sort)") {
    val p = plan("q88_bpe_pair_stats")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"q88 should shuffle twice (word agg, pair agg), saw $exchanges:\n$p")
    // the rank<=50 window must ride a TakeOrderedAndProject (global
    // top-k computed distributedly), NOT an Exchange SinglePartition
    // over the full pair table
    assert(p.contains("TakeOrderedAndProject"), s"q88 lost the top-k pushdown:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"q88 single-partition sort:\n$p")
    assert(p.contains("partial_"), s"q88 lost map-side partial agg:\n$p")
  }

  test("q65: chunking is a pure scan-stage generator (no shuffle at all)") {
    val p = plan("q65_chunk_overlap")
    assert(!p.contains("Exchange"), s"q65 gained a shuffle:\n$p")
    assert(p.contains("Generate"), s"q65 lost its generator:\n$p")
  }

  test("q68: SCD2 runs on ONE key shuffle — windows, run-agg, and interval close reuse it") {
    val p = plan("q68_scd2_intervals")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"q68 should shuffle once, saw $exchanges:\n$p")
  }

  test("q129: fills are key-partitioned windows over ONE cached bucket aggregate") {
    val p = plan("q129_timeseries_fill")
    // the event-stream scan + bucket aggregate compute once (cached);
    // bounds/grid and the fill join both read the InMemoryRelation
    assert(p.contains("InMemoryTableScan"), s"q129 lost the obs cache:\n$p")
    // all four fill windows are user_id-partitioned — a global window
    // (SinglePartition) would serialize the corpus through one task
    assert(!p.contains("Exchange SinglePartition"), s"q129 global window:\n$p")
    // every shuffle is keyed on user_id (bucket agg, bounds, windows)
    val ex = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    val exAll = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == exAll && exAll >= 1, s"q129 non-key shuffle:\n$p")
  }

  test("q102: mixture trim is ONE stratum-keyed shuffle (budgets ride from the driver)") {
    val p = plan("q102_temperature_mixture")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"q102 should shuffle once (stratum window), saw $exchanges:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"q102 global window:\n$p")
  }

  test("q105: salting is result-invisible AND the join stays a (key, salt) equi-join") {
    val p = plan("q105_skew_salted_join")
    assert(p.contains("__salt"), s"q105 lost the salt key:\n$p")
    // equi-join machinery only — the build replication is an explode
    // Generate, never a nested-loop respray
    assert(p.contains("Generate"), s"q105 lost the build replication:\n$p")
  }
}

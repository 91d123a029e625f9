package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** transactional-table tier: MERGE/DML, change feed, time travel,
  * deletion vectors, skipping/bloom/z-order reads, incremental and
  * materialized views, SQL surface, stats census, dynamic pruning.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtTxLogQueries {

  val queries: Map[String, Q] = Map(

    // ── z-order (Morton) clustering values: the multi-dimensional
    // data-layout key — bit-interleaved range buckets of (l_partkey,
    // l_suppkey), pure integer arithmetic, oracled bit-for-bit. The
    // layout itself (range partition + sort on zval) is exercised by
    // ZOrderSpec's file-clustering proof.
    "q64_zorder_values" -> { (s, dir) =>
      graft.sources.ZOrder.withZValue(
          Tables.lineitem(s, dir), Seq("l_partkey", "l_suppkey"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("zval"))
    },

    // ── transactional MERGE on the commit-log table (TxLogTable —
    // the multi-writer replacement for the rename-swap sink): the q05
    // merge-latest state rebuilt through THREE serialized optimistic
    // commits (create, merge of even event_ids, merge of odd), each a
    // versioned manifest + immutable data dirs, then a snapshot read.
    // Latest-wins composes across commits (max over a union = max of
    // per-half maxes), so the final snapshot must hash-equal the
    // single-shot q05 oracle — pinning that the log replay, snapshot
    // isolation, and the merge recompute preserve merge semantics
    // exactly, not just "some rows survived".
    "q112_txlog_merge" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q112"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val prec = Seq(col("ts_ns").desc, col("event_id").desc)
      t.ensureExists(ev.schema)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        Seq("user_id"), prec)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), prec)
      t.read().select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
    },

    // ── manifest-level DATA SKIPPING on the commit-log table: lineitem
    // appended as four ship-year range batches with per-file l_shipdate
    // stats in the manifests, then a pruned time-range read
    // (TxLogTable.readWhere) — the planner drops the pre-1996 batches
    // from manifest ranges alone (TxLogSkippingSpec pins the file
    // counts; here the HASH pins that pruning never drops a matching
    // row). The 100 TB shape: a time-ranged scan of an append-mostly
    // store schedules work proportional to the matched range, not to
    // table history.
    "q117_txlog_skipping_read" -> { (s, dir) =>
      val dsum = (c: org.apache.spark.sql.Column) =>
        sum(c.cast("decimal(18,4)")).cast("double")
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q117"))
      t.ensureExists(li.schema)
      Seq((0, 1994), (1994, 1996), (1996, 1997), (1997, 9999)).foreach {
        case (lo, hi) =>
          t.append(li.filter(year(col("l_shipdate")) >= lo &&
            year(col("l_shipdate")) < hi), statsCols = Seq("l_shipdate"))
      }
      // literal typed to the column (NTZ in the fixtures) so the
      // family-checked pruner engages instead of conservatively keeping
      val cutLit = li.schema("l_shipdate").dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          lit(java.time.LocalDateTime.of(1996, 6, 15, 0, 0))
        case _ => lit(java.sql.Timestamp.valueOf("1996-06-15 00:00:00"))
      }
      t.readWhere(col("l_shipdate") >= cutLit)
        .groupBy(year(col("l_shipdate")).as("ship_year"),
          month(col("l_shipdate")).as("ship_month"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_items"))
    },

    // ── row-level CHANGE FEED from the commit-log table: append the
    // even-id events raw (v1), transactionally merge the odd half
    // latest-wins (v2), then read changeFeed(0, v2) — the post-image
    // projection of the typed CDC (`changes()`). v1's change set is
    // the raw appended rows; v2's post-images cover every key the
    // merge changed: the odd-touched users (argmax over latest evens ∪
    // odds = the OVERALL latest event) AND the multi-even-row users
    // whose duplicate keys the latest-wins window collapsed even
    // though the batch never named them. DuckDB replays both arms in
    // one window. Pins that the feed carries exactly the rows each
    // commit changed (no snapshot diffing) with the right
    // `_commit_version` tags — what an incremental downstream (index
    // refresh, dedup-signature update) consumes at 100 TB instead of
    // re-reading the table.
    "q118_txlog_change_feed" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q118"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0))
      val v2 = t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      t.changeFeed(0L, v2)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("_commit_version"))
    },

    // ── full conditional MERGE INTO over the commit-log table: target
    // = the non-multiple-of-3 orders; source = per-order lineitem
    // revenue summary. Ordered clauses — WHEN MATCHED AND has_return
    // DELETE, WHEN MATCHED AND new_price > o_totalprice UPDATE (row :=
    // source projection), ELSE keep; WHEN NOT MATCHED AND NOT
    // has_return INSERT. The oracle replays all four arms in one
    // left-join CASE + insert UNION, so clause ORDER (delete shadows
    // update), the unmatched-keep arm, and the guarded insert are all
    // under the hash. Plan: one full-outer key join + scan-stage
    // when-chain — the clause logic costs no extra exchange.
    "q119_txlog_merge_conditional" -> { (s, dir) =>
      import graft.sources.TxLogTable
      val ord = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val target = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      val src = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").as("new_price"),
          (max(when(col("l_returnflag") === "R", 1).otherwise(0)) === 1)
            .as("has_return"))
        .join(ord.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus")), Seq("o_orderkey"))
        .withColumn("o_totalprice", col("new_price"))
      val t = new TxLogTable(s,
        scratchDir("graft_txlog_q119"))
      t.ensureExists(target.schema)
      t.append(target)
      t.mergeConditional(src, Seq("o_orderkey"),
        whenMatched = Seq(
          TxLogTable.MatchedDelete(Some("s.has_return")),
          TxLogTable.MatchedUpdate(Some("s.new_price > t.o_totalprice"))),
        notMatchedCondition = Some("NOT s.has_return"))
      t.read().select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    },

    // ── INCREMENTAL VIEW MAINTENANCE over the typed change feed: the
    // view (count + decimal sum of value by event_type) is seeded from
    // snapshot v1, then maintained PURELY from `changes()` deltas
    // across a merge (pre/post pairs) and a conditional merge with a
    // delete arm (explicit retractions) — the table's final state is
    // NEVER re-aggregated. The oracle recomputes the final state from
    // raw events in SQL; hash equality proves the CDC classification
    // (insert/update_preimage/update_postimage/delete) and the signed
    // fold are exact. The 100 TB contract: view refresh costs
    // O(change batch) + O(view), never O(table).
    "q125_incremental_view" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // even-user half; q126 runs the table-backed twin on the odd
      // half — disjoint workloads, so the two gates differ and the
      // suite pays for the merge pipeline once, not twice
      val ev = Tables.events(s, dir)
        .filter(pmod(col("user_id"), lit(2)) === 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q125"))
      t.ensureExists(ev.schema)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      // v1: per-user latest EVEN event (key-unique append)
      val v1 = t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
      val group = Seq("event_type"); val sums = Seq("value")
      val seeded = graft.ext.IncrementalView.seed(t.readAt(v1), group, sums)
      // v2: merge ALL odd events latest-wins → state = overall latest
      val v2 = t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      // v3: conditional merge — source carries the doubled value plus
      // a guard column; low-value users are deleted, the rest updated
      val src = ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__low", col("value") < 50)
        .withColumn("value", col("value") * 2)
      val v3 = t.mergeConditional(src, Seq("user_id"),
        whenMatched = Seq(
          graft.sources.TxLogTable.MatchedDelete(Some("s.__low")),
          graft.sources.TxLogTable.MatchedUpdate(None)),
        insertWhenNotMatched = false)
      val view = graft.ext.IncrementalView.applyChanges(
        graft.ext.IncrementalView.applyChanges(seeded,
          t.changes(v1, v2), group, sums),
        t.changes(v2, v3), group, sums)
      view.select(col("event_type"), col("n").as("n_users"),
        col("sum_value").cast("double").as("sum_value"))
    },

    // ── transactional MATERIALIZED VIEW refresh (q125's fold, table-
    // backed): the view lives in its own commit-log table and the
    // last-folded source version rides as a commit MARKER — state and
    // watermark advance in one atomic manifest, so refresh is
    // exactly-once (a redundant rerun after each commit is a no-op,
    // exercised here). Same final-state oracle as q125: hash equality
    // proves the marker bookkeeping folds each commit exactly once.
    "q126_materialized_view_refresh" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // odd-user half (q125 covers the evens — see its comment)
      val ev = Tables.events(s, dir)
        .filter(pmod(col("user_id"), lit(2)) === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q126s"))
      val mv = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q126v"))
      t.ensureExists(ev.schema)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      val group = Seq("event_type"); val sums = Seq("value")
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      // redundant refresh: marker == head, must fold nothing
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      val src = ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__low", col("value") < 50)
        .withColumn("value", col("value") * 2)
      t.mergeConditional(src, Seq("user_id"),
        whenMatched = Seq(
          graft.sources.TxLogTable.MatchedDelete(Some("s.__low")),
          graft.sources.TxLogTable.MatchedUpdate(None)),
        insertWhenNotMatched = false)
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      graft.ext.MaterializedView.read(mv)
        .select(col("event_type"), col("n").as("n_users"),
          col("sum_value").cast("double").as("sum_value"))
    },

    // ── Bloom file-skipping on the commit-log table: two appends with
    // fully-overlapping doc_id ranges (evens/odds — range stats alone
    // keep every file for any point lookup), manifest-level per-file
    // Bloom filters over the id AND source columns, then a point-
    // lookup read. The oracle replays the lookup against the raw
    // table; the spec pins pruning EFFECTIVENESS (files actually
    // skipped) — this query gates end-to-end correctness through the
    // build→manifest→prune→scan path.
    "q132_txlog_bloom_lookup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q132"))
      t.ensureExists(docs.schema)
      t.append(docs.filter(col("doc_id") % 2 === 0).coalesce(1),
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id", "source"))
      t.append(docs.filter(col("doc_id") % 2 === 1).coalesce(1),
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id", "source"))
      val hits = t.readWhere(col("doc_id").isin(7L, 42L, 123L, 999999L))
      val bySource = t.readWhere(col("source") === "src3")
      hits.unionByName(bySource)
    },

    // ── transactional row-level UPDATE + DELETE (the DML pair next to
    // MERGE): seed the commit-log table with events, UPDATE clicks
    // (value → value·2 + 1 where value present), DELETE errors, then
    // read the final snapshot AND the change feed's net deletes. The
    // oracle replays both statements over the raw table — pins SQL
    // WHERE semantics (null condition = untouched/kept) through the
    // optimistic-commit path.
    "q135_txlog_dml" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q135"))
      t.ensureExists(ev.schema)
      t.append(ev)
      t.update(col("event_type") === "click" && col("value").isNotNull,
        Map("value" -> (col("value") * 2 + 1)))
      t.delete(col("event_type") === "error")
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    },

    // ── the DataSource façade end-to-end: seed the commit-log table
    // through `df.write.format("txlog")` (three appends, stats+bloom
    // sidecars declared as writer options), then answer through
    // `spark.read.format("txlog")` with the `versionAsOf` option —
    // time travel to the click+view snapshot — and a filter Spark
    // pushes into the relation (manifest file pruning + parquet
    // row-group pushdown). EXACT oracle: replay over the raw events
    // table restricted to the first two appended types.
    "q136_txlog_source" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val root = scratchDir("graft_txlog_q136")
      def put(tpe: String, mode: String): Unit =
        ev.filter(col("event_type") === tpe).write.format("txlog")
          .mode(mode).option("statsCols", "event_id")
          .option("bloomCols", "event_type").save(root)
      put("click", "errorifexists") // v0 create + v1 append
      put("view", "append")         // v2
      put("error", "append")        // v3 — excluded by time travel
      s.read.format("txlog").option("versionAsOf", "2").load(root)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"),
          min(col("event_id")).as("min_event"))
    },

    // ── deletion-vector DML (merge-on-read): two stacked vectored
    // deletes over the commit-log table — the path a point delete on
    // a 100 TB table takes (deleted-rows-sized commit, zero file
    // rewrite). The in-query require is the no-rewrite invariant
    // gate: the live file set must be IDENTICAL across both deletes
    // (a copy-on-write regression throws, failing the oracle run
    // loudly). EXACT oracle: both WHERE conditions replayed over the
    // raw table with SQL null semantics.
    "q151_dv_delete" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q151"))
      t.ensureExists(ev.schema)
      t.append(ev.repartition(4))
      val before = t.liveDataPaths(t.currentVersion).toSet
      t.deleteVectored(col("event_type") === "error")
      t.deleteVectored(col("event_type") === "click" && col("value") > 100.0)
      val after = t.liveDataPaths(t.currentVersion).toSet
      require(after == before,
        "vectored delete must not rewrite live data files")
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    },

    // ── CHECK constraints under the oracle (invariant form): a txlog
    // table takes a valid leg, gains a constraint, REJECTS a violating
    // append (the table must be byte-identical after the veto — caught
    // exception + version check, q142-style: a missed veto poisons the
    // `enforced` column so the hash goes red loudly), accepts a valid
    // leg under the constraint, then drops it and accepts the formerly
    // vetoed leg. The oracle restates the surviving row set in SQL.
    "q196_txlog_constraint_gate" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q196"))
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 0))
      t.addConstraint("id_mod3", "event_id % 3 = 0")
      val vPre = t.currentVersion
      val vetoed =
        try { t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1)); false }
        catch { case _: Exception => t.currentVersion == vPre }
      // a valid leg under the live constraint (ids ≡2 mod 3, shifted +1)
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .withColumn("event_id", col("event_id") + 1))
      t.dropConstraint("id_mod3")
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1))
      t.read().withColumn("enforced", lit(if (vetoed) 1L else 0L))
    },

    // ── COPY INTO under the oracle (idempotency form): three landing
    // files arrive in two waves; copyInto runs FOUR times (two exact
    // replays among them) and the final table must hold every landed
    // row EXACTLY once, with the ingested-file census on each row.
    "q197_txlog_copy_into" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q197")
      val land = root + "/land"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
      docs.filter(col("doc_id") < 20).coalesce(1)
        .write.parquet(land + "/f1")
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 40).coalesce(1)
        .write.parquet(land + "/f2")
      val t = new graft.sources.TxLogTable(s, root + "/table")
      t.ensureExists(docs.schema)
      val glob = land + "/f*/part-*.parquet"
      t.copyInto(glob)
      t.copyInto(glob) // exact replay: must be a no-op
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 60).coalesce(1)
        .write.parquet(land + "/f3")
      t.copyInto(glob) // only f3 is fresh
      t.copyInto(glob) // replay again
      t.read().withColumn("n_files", lit(t.copiedFiles.size.toLong))
    },

    // ── TIME TRAVEL under the oracle: three appends land as three
    // versions; the query reads the table AS OF the middle one (by
    // version AND by its commit timestamp — both must agree), so the
    // oracle pins that later commits cannot disturb an old snapshot.
    // The third leg rides a DELETE too, proving the pre-delete
    // snapshot still shows the deleted rows.
    "q198_txlog_time_travel" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q198"))
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 0)) // v1
      val v2 = t.append(ev.filter(pmod(col("event_id"), lit(4)) === 1))
      val ts2 = t.history().find(_._1 == v2).get._3
      // make v3's commit millisecond strictly later so the as-of read
      // of ts2 is unambiguous
      while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 2)) // v3
      t.delete(col("event_id") % 4 === 0) // v4: wipes the v1 leg
      val byVersion = t.readAt(v2)
      val byTime = t.readAsOf(ts2)
      // both reads must agree — union the version read with the
      // timestamp read's anti-diff (empty when equal), so a divergence
      // poisons the row count
      byVersion.unionAll(byTime.exceptAll(byVersion))
        .select(col("event_id"), col("user_id"),
          col("value").cast("double").as("value"))
    },

    // ── SCHEMA EVOLUTION reads under the oracle: three appends with
    // three different column sets (base, +value, −user_id). The final
    // read surfaces the UNION schema with nulls exactly where each
    // leg's files lack the column — the additive-evolution contract
    // restated row-for-row in SQL.
    "q199_txlog_schema_evolution" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q199"))
      val ev = Tables.events(s, dir)
      val base = ev.select(col("event_id"), col("user_id"))
      t.ensureExists(base.schema)
      t.append(base.filter(pmod(col("event_id"), lit(3)) === 0))
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1)
        .select(col("event_id"), col("user_id"), col("value")))
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .select(col("event_id"), col("value")))
      t.read().select(col("event_id"), col("user_id"),
        col("value").cast("double").as("value"))
    },

    // ── the SQL-DML surface, gate 1 of 4: MERGE INTO as a STATEMENT
    // (the reference's own idiom — its upserts are SQL strings,
    // pull_new_sales_list.py:252-264) routed through the parser
    // extension to the same oracled mergeConditional as q119. Same
    // seed, same clauses, same oracle — a routing slip anywhere in
    // parse → clause mapping → key extraction → execution breaks the
    // hash against q119's replay.
    "q201_sql_txlog_merge" -> { (s, dir) =>
      val ord = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val target = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      val src = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").as("new_price"),
          (max(when(col("l_returnflag") === "R", 1).otherwise(0)) === 1)
            .as("has_return"))
        .join(ord.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus")), Seq("o_orderkey"))
        .withColumn("o_totalprice", col("new_price"))
      val root = scratchDir("graft_txlog_q201")
      val t = new graft.sources.TxLogTable(s, root)
      t.ensureExists(target.schema)
      t.append(target)
      src.createOrReplaceTempView("q201_merge_src")
      graft.plans.GraftSql.sql(s,
        s"""MERGE INTO txlog.`$root` AS tgt USING q201_merge_src AS src
           |ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED AND src.has_return THEN DELETE
           |WHEN MATCHED AND src.new_price > tgt.o_totalprice
           |  THEN UPDATE SET *
           |WHEN NOT MATCHED AND NOT src.has_return THEN INSERT *
           |""".stripMargin).collect()
      graft.plans.GraftSql.sql(s,
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM txlog.`$root`""".stripMargin)
    },

    // ── SQL-DML gate 2: UPDATE + DELETE statements (q135's twin), the
    // final aggregate ALSO through SQL over the `txlog.`path`` read
    // substitution — statement-only end to end.
    "q202_sql_txlog_dml" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val root = scratchDir("graft_txlog_q202")
      val t = new graft.sources.TxLogTable(s, root)
      t.ensureExists(ev.schema)
      t.append(ev)
      graft.plans.GraftSql.sql(s,
        s"""UPDATE txlog.`$root` SET value = value * 2 + 1
           |WHERE event_type = 'click' AND value IS NOT NULL""".stripMargin)
        .collect()
      graft.plans.GraftSql.sql(s,
        s"DELETE FROM txlog.`$root` WHERE event_type = 'error'").collect()
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_type, count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           |FROM txlog.`$root` GROUP BY event_type""".stripMargin)
    },

    // ── SQL-DML gate 3: time travel as SQL (q198's twin) — VERSION AS
    // OF and TIMESTAMP AS OF must agree, pinned by the same
    // union+except construction, all expressed as one statement.
    "q203_sql_txlog_time_travel" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q203")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 0)) // v1
      val v2 = t.append(ev.filter(pmod(col("event_id"), lit(4)) === 1))
      val ts2 = t.history().find(_._1 == v2).get._3
      while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 2)) // v3
      graft.plans.GraftSql.sql(s,
        s"DELETE FROM txlog.`$root` WHERE event_id % 4 = 0").collect()
      val iso = java.time.Instant.ofEpochMilli(ts2).toString
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           |FROM txlog.`$root` VERSION AS OF $v2
           |UNION ALL
           |(SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           | FROM txlog.`$root` TIMESTAMP AS OF '$iso'
           | EXCEPT ALL
           | SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           | FROM txlog.`$root` VERSION AS OF $v2)""".stripMargin)
    },

    // ── SQL-DML gate 4: INSERT INTO / INSERT OVERWRITE statements —
    // positional-cast semantics onto the table schema, overwrite
    // resetting the live set, appends landing after it.
    "q204_sql_txlog_insert" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q204")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      ev.createOrReplaceTempView("q204_events")
      def run(sql: String): Unit =
        { graft.plans.GraftSql.sql(s, sql).collect(); () }
      run(s"""INSERT INTO txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 2 = 0""".stripMargin)
      run(s"""INSERT OVERWRITE txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 3 = 0""".stripMargin)
      run(s"""INSERT INTO txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 3 = 1""".stripMargin)
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           |FROM txlog.`$root`""".stripMargin)
    },

    // ── DYNAMIC FILE PRUNING under the oracle: a range-clustered
    // txlog fact (lineitem, 16 files with per-file l_orderkey ranges +
    // blooms) joined to a 3-ROW dimension. No static predicate exists
    // on the join key, so without runtime filtering every file is
    // scanned; Spark's own dynamic-pruning subquery (inserted by the
    // default optimizer — no extension) reaches the V2 scan through
    // SupportsRuntimeFiltering and prunes the file list through the
    // manifest stats at execution time. The oracle replays the join
    // exactly — pruning must be invisible to the result — and
    // TxLogRuntimeFilterSpec pins the files-skipped effectiveness on
    // the same construction.
    "q205_txlog_dynamic_pruning" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q205")
      val t = new graft.sources.TxLogTable(s, root)
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
      t.ensureExists(li.schema)
      t.append(li)
      t.compactClustered(Seq("l_orderkey"), numFiles = 16,
        statsCols = Seq("l_orderkey"))
      val fact = s.read.format("txlog").load(root)
      // deterministic handful-of-rows dim (no static fact predicate)
      val dimKeys = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 997 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val joined = fact.join(dimKeys,
          fact("l_orderkey") === dimKeys("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
      joined
    },

    // ── the CBO statistics census under the oracle: the manifest-
    // aggregated table stats (exact row count, typed min/max fold,
    // null counts — what TxLogCboStats hands Catalyst) restated by
    // DuckDB directly from the raw table. Stats ride two commits (one
    // plain, one clustered overwrite with its own sidecars), so the
    // chain fold is under the hash, not just a single commit's
    // numbers. NDV is sketch-estimated (±4%) and therefore gated by
    // TxLogCboStatsSpec's error band, not a value oracle.
    "q206_txlog_stats_census" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q206")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        statsCols = Seq("event_id", "value"))
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        statsCols = Seq("event_id", "value"))
      val (rows, ranges, _) = t.statsSummaryAt(t.currentVersion).get
      val r = ranges("event_id")
      val v = ranges("value")
      import s.implicits._
      Seq((rows, r.min.get.toLong, r.max.get.toLong, r.nulls,
        v.nulls)).toDF("n_rows", "min_event", "max_event",
        "event_nulls", "value_nulls")
    },

    // ── maintenance SQL statements (the Delta idioms Spark's grammar
    // lacks): OPTIMIZE ... ZORDER BY rewrites the two-append table
    // into 8 stat-carrying z-clustered files; VACUUM FULL then
    // collects exactly the two pre-optimize dirs (deterministic — one
    // staged dir per append); DESCRIBE HISTORY counts the four
    // commits (create + 2 appends + optimize). The data aggregate
    // rides the post-optimize snapshot, so the zorder rewrite is
    // under the value hash and the maintenance counts pin the
    // statement semantics.
    "q207_sql_txlog_maintenance" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q207")
      val t = new graft.sources.TxLogTable(s, root)
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      t.ensureExists(li.schema)
      t.append(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
      t.append(li.filter(pmod(col("l_orderkey"), lit(2)) === 1))
      def sql(q: String) = graft.plans.GraftSql.sql(s, q)
      sql(s"OPTIMIZE txlog.`$root` ZORDER BY (l_orderkey, l_partkey) " +
        "INTO 8 FILES").collect()
      val removed = sql(s"VACUUM txlog.`$root` FULL RETAIN 0 HOURS").count()
      val commits = sql(s"DESCRIBE HISTORY txlog.`$root`").count()
      sql(s"""SELECT l_orderkey % 100 AS okey_bucket,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             |    AS sum_qty
             |FROM txlog.`$root` GROUP BY l_orderkey % 100""".stripMargin)
        .withColumn("n_removed", lit(removed))
        .withColumn("n_commits", lit(commits))
    },

    // ── the CATALOG path: `CREATE TABLE ... USING txlog` then INSERT
    // INTO / INSERT OVERWRITE / SELECT by TABLE NAME — Spark's own
    // catalog resolution over the registered DataSource (no graft
    // parser involved), exercising the V1 InsertableRelation seam the
    // reference's SQL-first user would hit. refreshTable between
    // writes pins that the catalog cache never serves a stale
    // snapshot.
    "q208_sql_txlog_catalog" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q208")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      new graft.sources.TxLogTable(s, root).ensureExists(ev.schema)
      s.sql("DROP TABLE IF EXISTS q208_cat")
      s.sql(s"CREATE TABLE q208_cat USING txlog OPTIONS (path '$root')")
      ev.createOrReplaceTempView("q208_ev")
      s.sql("""INSERT INTO q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 2 = 0""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""INSERT OVERWRITE TABLE q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 3 = 0""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""INSERT INTO q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 3 = 1""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
              |FROM q208_cat""".stripMargin)
    },

    // ── DESCRIBE DETAIL under the oracle: the snapshot-summary row
    // (version, live file count, exact stats-covered row count,
    // required reader protocol) with every field deterministic by
    // construction — two single-file stats-bearing appends — and
    // restated by DuckDB from the raw table. Pins that the summary
    // the CBO/introspection surface reports is the truth, not an
    // estimate.
    "q209_sql_txlog_detail" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q209")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1),
        statsCols = Seq("event_id"))
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1),
        statsCols = Seq("event_id"))
      graft.plans.GraftSql.sql(s, s"DESCRIBE DETAIL txlog.`$root`")
        .select(col("version"), col("num_files"), col("num_rows"),
          col("min_reader").cast("long").as("min_reader"))
    },
    // ── the PERSISTENT catalog under the oracle: names as a directory
    // tree (graft.sources.TxLogCatalog — the HadoopCatalog pattern, no
    // metastore service). CREATE TABLE + two INSERTs land through
    // Spark's own V2 catalog exec nodes, a MERGE by catalog-qualified
    // NAME routes through the SQL-DML layer, and the final SELECT runs
    // in a SECOND session (fresh state, fresh catalog instance) that
    // knows the table only by name — cross-session durability is under
    // the value hash, not just a spec.
    "q211_txlog_catalog" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q211")
      // catalog name derived from the root: a session's CatalogManager
      // caches a catalog INSTANCE at first use, so a re-run (bench
      // warmup + measured passes share one session) must register a
      // fresh name or the cached instance would keep the old root
      val cat = s"q211lake_${root.hashCode.toHexString}"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxLogCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      ev.createOrReplaceTempView("q211_ev")
      s.sql(s"CREATE TABLE $cat.ev " +
        "(event_id BIGINT, user_id BIGINT, value DOUBLE) USING txlog")
      s.sql(s"""INSERT INTO $cat.ev
               |SELECT event_id, user_id, value FROM q211_ev
               |WHERE event_id % 2 = 0""".stripMargin)
      s.sql(s"""INSERT INTO $cat.ev
               |SELECT event_id, user_id, value FROM q211_ev
               |WHERE event_id % 2 = 1 AND event_id % 3 = 0""".stripMargin)
      // MERGE by NAME: odd non-multiples-of-3 arrive, value doubled
      ev.filter(col("event_id") % 2 === 1 && col("event_id") % 3 =!= 0)
        .withColumn("value", col("value") * 2)
        .createOrReplaceTempView("q211_upd")
      graft.plans.GraftSql.sql(s,
        s"""MERGE INTO $cat.ev t USING q211_upd s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      // a SECOND session resolves the name purely from the directory
      val s2 = s.newSession()
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxLogCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      s2.sql(s"""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
                |FROM $cat.ev""".stripMargin)
    },

    // ── MANIFEST-STATS AGGREGATE PUSHDOWN under the oracle: ungrouped
    // count(*)/count(col)/min/max over a stats-covered snapshot answer
    // from the transaction log alone — a metadata walk and one
    // driver-local row, zero files opened (the 100 TB census query).
    // Exactness is the whole point, so the values ride the hash
    // against DuckDB recomputing them from the raw rows. The SQL read
    // routes through the V2 source, where the pushdown lives;
    // TxLogSourceSpec pins the LocalTableScan plan shape.
    "q212_txlog_stats_agg" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q212")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        statsCols = Seq("event_id", "user_id", "value"))
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        statsCols = Seq("event_id", "user_id", "value"))
      graft.plans.GraftSql.sql(s,
        s"""SELECT count(*) AS n_rows,
           |  count(value) AS n_values,
           |  min(event_id) AS min_event, max(event_id) AS max_event,
           |  CAST(min(value) AS DOUBLE) AS min_value,
           |  CAST(max(value) AS DOUBLE) AS max_value
           |FROM txlog.`$root`""".stripMargin)
    },

    // ── GROUPED manifest census: GROUP BY over a FILE-CONSTANT
    // column (per-file min == max, zero nulls — what per-group
    // ingestion and the clustered layout produce, the engine's
    // stand-in for hive partition values). Each file belongs to
    // exactly one group, so grouped count/count(col)/min/max fold
    // exactly from the per-file manifest stats: one driver metadata
    // walk, zero files opened, zero jobs — the other half of the
    // 100 TB census family (`GROUP BY date` over a partitioned
    // corpus). Values ride the hash against DuckDB recomputing them
    // from the raw rows; TxLogSourceSpec pins the LocalTableScan plan
    // and every decline arm (non-constant files fall back to a real
    // scan).
    "q213_txlog_grouped_census" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q213")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("grp", pmod(col("user_id"), lit(4L)))
      t.ensureExists(ev.schema)
      (0L until 4L).foreach { g =>
        t.append(ev.filter(col("grp") === g),
          statsCols = Seq("grp", "event_id", "value"))
      }
      graft.plans.GraftSql.sql(s,
        s"""SELECT grp, count(*) AS n_rows, count(value) AS n_values,
           |  min(event_id) AS min_event, max(event_id) AS max_event,
           |  CAST(min(value) AS DOUBLE) AS min_value
           |FROM txlog.`$root` GROUP BY grp""".stripMargin)
    },

    // ── PARTITIONED BY end to end: CREATE TABLE … PARTITIONED BY
    // (grp) records cluster-by metadata; ONE shuffled native ingest
    // (writeTo.append — the V2 BATCH_WRITE path) reassembles the
    // groups through the write's required distribution/ordering and
    // splits staged files so each is grp-CONSTANT with default
    // all-column stats; the grouped census then answers from the
    // manifest and a point predicate prunes files. The user-visible
    // partition workflow — DDL, ingest, census — under one hash,
    // with none of hive partitioning's per-value directories.
    // ── REPLACE WHERE: predicate-scoped overwrite on a PARTITIONED
    // catalog table — native clustered ingest, then SQL `INSERT INTO
    // … REPLACE WHERE grp = 1` swaps exactly that partition's files
    // (file-granular, zero kept bytes rewritten — the Delta
    // replaceWhere idiom through Spark's own OverwriteByExpression).
    // The final rollup hashes against DuckDB recomputing the swap.
    "q216_replace_where" -> { (s, dir) =>
      val cat = s"graftq216_${scala.util.Random.nextInt(1000000)}"
      val root = scratchDir("graft_txlog_q216")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxLogCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"CREATE TABLE $cat.ev (grp BIGINT, event_id BIGINT, " +
        s"user_id BIGINT, value DOUBLE) USING txlog PARTITIONED BY (grp)")
      val src = Tables.events(s, dir)
        .select(pmod(col("user_id"), lit(4L)).as("grp"),
          col("event_id"), col("user_id"), col("value"))
      src.writeTo(s"$cat.ev").append()
      src.createOrReplaceTempView("graft_q216_src")
      // merge-on-read point deletes BEFORE the swap: the snapshot the
      // replaceWhere classifies carries live deletion vectors — kept
      // partitions keep their vectors, the replaced one re-seeds
      new graft.sources.TxLogTable(s, s"$root/ev")
        .deleteVectored(pmod(col("event_id"), lit(113L)) === 0L)
      s.sql(s"INSERT INTO $cat.ev REPLACE WHERE grp = 1 " +
        "SELECT grp, event_id, user_id, value * 10 AS value " +
        "FROM graft_q216_src WHERE grp = 1")
      s.sql(
        s"""SELECT grp, count(*) AS n_rows,
           |  min(event_id) AS min_event, max(event_id) AS max_event,
           |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
           |    AS sum_value
           |FROM $cat.ev GROUP BY grp""".stripMargin)
    },

    // ── MERGE WITH SCHEMA EVOLUTION: a schema-drifting upsert feed
    // (the normal CDC shape) lands WITHOUT pre-conforming — the
    // source adds a `score` column (additive widening) and omits
    // `max_event` (kept on update, null-filled on insert). DuckDB
    // recomputes the full-outer fold.
    "q217_merge_schema_evolution" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q217")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
      val tgt = ev.filter(pmod(col("user_id"), lit(7L)) === 0L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("event_id")).as("max_event"))
      t.ensureExists(tgt.schema)
      t.append(tgt, statsCols = Seq("user_id"))
      val src = ev.filter(pmod(col("user_id"), lit(5L)) === 0L &&
          pmod(col("event_id"), lit(2L)) === 0L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("value")).cast("double").as("score"))
      t.mergeConditional(src, Seq("user_id"),
        whenMatched = Seq(graft.sources.TxLogTable.MatchedUpdate(None)),
        withSchemaEvolution = true)
      t.read().select(col("user_id"), col("n_events"),
        col("max_event"), col("score"))
    },

    // ── VECTORED UPDATE (merge-on-read): a point-ish UPDATE commits
    // a deletion-vector sidecar + post-image append — no live file
    // rewritten — and the read-side state must equal the rewrite
    // semantics DuckDB recomputes.
    "q218_update_vectored" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q218")
      val t = new graft.sources.TxLogTable(s, root)
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      t.ensureExists(li.schema)
      t.append(li)
      t.compactClustered(Seq("l_orderkey"), 8,
        statsCols = Seq("l_orderkey"))
      t.updateVectored(pmod(col("l_orderkey"), lit(97L)) === 0L,
        Map("l_quantity" -> (col("l_quantity") * 2)))
      t.read().agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"),
        sum(when(pmod(col("l_orderkey"), lit(97L)) === 0L, 1L)
          .otherwise(0L)).as("n_touched"))
    },

    // ── INCREMENTAL OPTIMIZE (the Delta OPTIMIZE … WHERE idiom):
    // group-constant commits, one group fragmented across two
    // commits, then `OPTIMIZE … WHERE grp = 1` bins ONLY that
    // group's files (mustMatch scope) — every other file rides the
    // manifest verbatim, and the census afterwards is byte-exact.
    "q219_incremental_optimize" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q219")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("grp", pmod(col("user_id"), lit(4L)))
      t.ensureExists(ev.schema)
      (0L until 4L).foreach { g =>
        if (g == 1L) { // group 1 lands fragmented: two commits
          t.append(ev.filter(col("grp") === g &&
            pmod(col("event_id"), lit(2L)) === 0L),
            statsCols = Seq("grp", "event_id", "value"))
          t.append(ev.filter(col("grp") === g &&
            pmod(col("event_id"), lit(2L)) === 1L),
            statsCols = Seq("grp", "event_id", "value"))
        } else t.append(ev.filter(col("grp") === g),
          statsCols = Seq("grp", "event_id", "value"))
      }
      graft.plans.GraftSql.sql(s,
        s"OPTIMIZE txlog.`$root` WHERE grp = 1 INTO 1 FILES").collect()
      graft.plans.GraftSql.sql(s,
        s"""SELECT grp, count(*) AS n_rows, count(value) AS n_values,
           |  min(event_id) AS min_event, max(event_id) AS max_event
           |FROM txlog.`$root` GROUP BY grp""".stripMargin)
    },

    // ── FILE-GRANULAR MERGE: a small delta lands on a clustered
    // table — classification against manifest key ranges keeps the
    // untouched files VERBATIM (TxLogFileGranularDmlSpec pins the
    // rewrite counts; here the hash pins that the optimization never
    // changes the result).
    "q220_file_granular_merge" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q220")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("rev", lit(0L))
      t.ensureExists(ev.schema)
      t.append(ev)
      t.compactClustered(Seq("event_id"), 8,
        statsCols = Seq("event_id"))
      val delta = ev.filter(pmod(col("event_id"), lit(101L)) === 0L)
        .withColumn("value", col("value") * 3)
        .withColumn("rev", lit(1L))
      t.merge(delta, Seq("event_id"), Seq(col("rev").desc),
        statsCols = Seq("event_id"))
      t.read().agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"),
        sum(col("rev")).as("n_delta"))
    },

    // ── HYBRID census: the same grouped census with a straggler —
    // one stats-less unclustered append lands AFTER the four
    // group-constant appends. The old all-or-nothing pushdown would
    // degrade the whole GROUP BY to a full scan; the hybrid folds the
    // constant files from the manifest and reads ONLY the straggler,
    // merged by Spark's partial-aggregate machinery (count→sum,
    // min/max→min/max above the scan). Values ride the hash against
    // DuckDB recomputing the duplicated-union base; TxLogSourceSpec
    // pins files-opened = stragglers-only.
    "q215_txlog_hybrid_census" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q215")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("grp", pmod(col("user_id"), lit(4L)))
      t.ensureExists(ev.schema)
      (0L until 4L).foreach { g =>
        t.append(ev.filter(col("grp") === g),
          statsCols = Seq("grp", "event_id", "value"))
      }
      // the straggler: stats-less, bucket-mixed, single file
      t.append(ev.filter(pmod(col("event_id"), lit(97L)) === 0)
        .coalesce(1))
      graft.plans.GraftSql.sql(s,
        s"""SELECT grp, count(*) AS n_rows, count(value) AS n_values,
           |  min(event_id) AS min_event, max(event_id) AS max_event
           |FROM txlog.`$root` GROUP BY grp""".stripMargin)
    },

    "q214_partitioned_census" -> { (s, dir) =>
      val cat = s"graftq214_${scala.util.Random.nextInt(1000000)}"
      val root = scratchDir("graft_txlog_q214")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.TxLogCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"CREATE TABLE $cat.ev (grp BIGINT, event_id BIGINT, " +
        s"user_id BIGINT, value DOUBLE) USING txlog PARTITIONED BY (grp)")
      Tables.events(s, dir)
        .select(pmod(col("user_id"), lit(4L)).as("grp"),
          col("event_id"), col("user_id"), col("value"))
        .repartition(8, col("event_id")) // deliberately shuffled ingest
        .writeTo(s"$cat.ev").append()
      s.sql(
        s"""SELECT grp, count(*) AS n_rows,
           |  min(event_id) AS min_event, max(event_id) AS max_event,
           |  CAST(min(value) AS DOUBLE) AS min_value,
           |  CAST(max(value) AS DOUBLE) AS max_value
           |FROM $cat.ev GROUP BY grp""".stripMargin)
    },

  )

  private[queries] val oracleBase: Map[String, String] = Map(

    // the schema-evolved merge: full-outer fold — updated rows take
    // the source's n/score and KEEP the target-only max_event;
    // inserted rows null-fill it; untouched rows read score as null
    "q217_merge_schema_evolution" ->
      """WITH tgt AS (
        |  SELECT user_id, COUNT(*) AS n, MAX(event_id) AS max_event
        |  FROM events WHERE user_id % 7 = 0 GROUP BY 1),
        |src AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    CAST(MAX(value) AS DOUBLE) AS score
        |  FROM events WHERE user_id % 5 = 0 AND event_id % 2 = 0
        |  GROUP BY 1)
        |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
        |  CAST(CASE WHEN s.user_id IS NOT NULL THEN s.n ELSE t.n END
        |    AS BIGINT) AS n_events,
        |  CAST(t.max_event AS BIGINT) AS max_event,
        |  s.score AS score
        |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id"""
        .stripMargin,

    // vectored update = rewrite semantics: doubled quantity on the
    // matched keys, everything else untouched
    "q218_update_vectored" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(CASE WHEN l_orderkey % 97 = 0
        |    THEN l_quantity * 2 ELSE l_quantity END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CASE WHEN l_orderkey % 97 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_touched
        |FROM lineitem""".stripMargin,

    // incremental OPTIMIZE is physically invisible: the census equals
    // the plain rollup (the appends partition events exactly)
    "q219_incremental_optimize" ->
      """SELECT user_id % 4 AS grp,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(value) AS BIGINT) AS n_values,
        |  CAST(MIN(event_id) AS BIGINT) AS min_event,
        |  CAST(MAX(event_id) AS BIGINT) AS max_event
        |FROM events GROUP BY 1""".stripMargin,

    // file-granular merge = latest-wins semantics: the delta's tripled
    // values override exactly the %101 keys
    "q220_file_granular_merge" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(CASE WHEN event_id % 101 = 0
        |    THEN value * 3 ELSE value END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CASE WHEN event_id % 101 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_delta
        |FROM events""".stripMargin,

    // the commit-log merge must reproduce the single-shot q05 state
    // exactly: DuckDB replays latest-wins over ALL events in one pass
    // (max over a union = max of per-half maxes), ns-exact tie order
    "q112_txlog_merge" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    // the pruned read must equal a plain filtered scan — DuckDB sees
    // the whole table, the engine plans from manifest ranges only
    "q117_txlog_skipping_read" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-06-15 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // change feed replay: v1 = the raw even-id rows; v2 = per user
    // touched by an odd id, the overall latest event (argmax over
    // evens-latest ∪ odds = argmax over all events of that user)
    "q118_txlog_change_feed" ->
      """SELECT user_id, event_id, event_type, value,
        |       CAST(1 AS BIGINT) AS _commit_version
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT user_id, event_id, event_type, value,
        |       CAST(2 AS BIGINT) AS _commit_version
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND (
        |  user_id IN (
        |    SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1)
        |  OR user_id IN (
        |    SELECT user_id FROM events WHERE event_id % 2 = 0
        |    GROUP BY 1 HAVING COUNT(*) > 1))""".stripMargin,

    // conditional-merge replay: matched+returned → deleted; matched
    // with higher recomputed price → updated; other matched → kept;
    // unmatched source (o_orderkey % 3 = 0) inserted unless returned
    "q119_txlog_merge_conditional" ->
      """WITH src AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |           AS new_price,
        |         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
        |           AS has_return
        |  FROM lineitem GROUP BY 1)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        |       CASE WHEN s.o_orderkey IS NOT NULL
        |                 AND s.new_price > t.o_totalprice
        |            THEN s.new_price ELSE t.o_totalprice END AS o_totalprice
        |FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |WHERE t.o_orderkey % 3 <> 0
        |  AND (s.o_orderkey IS NULL OR NOT s.has_return)
        |UNION ALL
        |SELECT s.o_orderkey, o.o_custkey, o.o_orderstatus,
        |       s.new_price AS o_totalprice
        |FROM src s JOIN orders o ON s.o_orderkey = o.o_orderkey
        |WHERE s.o_orderkey % 3 = 0 AND NOT s.has_return""".stripMargin,

    // Morton interleave: bit j of column i lands at position j·k+i —
    // the 16 shift/mask terms are generated to match ZOrder.interleave
    // exactly (k=2, bits=8; i=0 partkey, i=1 suppkey).
    "q64_zorder_values" -> {
      val terms = (0 until 8).flatMap(j => Seq(
        s"(((bp >> $j) & 1) << ${2 * j})",
        s"(((bs >> $j) & 1) << ${2 * j + 1})")).mkString(" + ")
      s"""WITH mm AS (
         |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |  FROM lineitem),
         |b AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(floor((l_partkey - pmin) * 256.0 / (pmax - pmin + 1)) AS BIGINT) AS bp,
         |    CAST(floor((l_suppkey - smin) * 256.0 / (smax - smin + 1)) AS BIGINT) AS bs
         |  FROM lineitem CROSS JOIN mm)
         |SELECT l_orderkey, l_linenumber, $terms AS zval FROM b""".stripMargin
    },

    // full recompute of the table's FINAL state (overall-latest per
    // user, low-value users deleted, survivors' value doubled) — the
    // engine side never aggregates that state, it folds the typed
    // change feed; hash equality proves CDC + IVM exact
    "q125_incremental_view" ->
      """WITH l AS (
        |  SELECT user_id, event_type, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 2 = 0),
        |final AS (
        |  SELECT user_id, event_type, value * 2 AS value
        |  FROM l WHERE rn = 1 AND NOT (value < 50))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM final GROUP BY 1""".stripMargin,

    // same final state as q125, reached through the marker-gated
    // table-backed refresh loop instead of the in-memory fold
    "q126_materialized_view_refresh" ->
      """WITH l AS (
        |  SELECT user_id, event_type, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 2 = 1),
        |final AS (
        |  SELECT user_id, event_type, value * 2 AS value
        |  FROM l WHERE rn = 1 AND NOT (value < 50))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM final GROUP BY 1""".stripMargin,

    // the point-lookup ∪ source-lookup the bloom-pruned read answered
    "q132_txlog_bloom_lookup" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id IN (7, 42, 123, 999999)
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE source = 'src3'""".stripMargin,

    // UPDATE then DELETE replayed over the raw table
    "q135_txlog_dml" ->
      """WITH upd AS (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_type = 'click' AND value IS NOT NULL
        |         THEN value * 2 + 1 ELSE value END AS value
        |  FROM events),
        |fin AS (SELECT * FROM upd WHERE NOT COALESCE(event_type = 'error', FALSE))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY 1""".stripMargin,

    // time-travel snapshot (first two appends) + pushed null filter
    "q136_txlog_source" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(MIN(event_id) AS BIGINT) AS min_event
        |FROM events
        |WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // both vectored deletes replayed with SQL null semantics
    "q151_dv_delete" ->
      """WITH fin AS (
        |  SELECT * FROM events
        |  WHERE NOT COALESCE(event_type = 'error', FALSE)
        |    AND NOT COALESCE(event_type = 'click' AND value > 100, FALSE))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY 1""".stripMargin,
    "q198_txlog_time_travel" ->
      """SELECT event_id, user_id, value
        |FROM events WHERE event_id % 4 IN (0, 1)""".stripMargin,
    "q199_txlog_schema_evolution" ->
      """SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id, user_id, value
        |FROM events WHERE event_id % 3 = 1
        |UNION ALL
        |SELECT event_id, CAST(NULL AS BIGINT), value
        |FROM events WHERE event_id % 3 = 2""".stripMargin,
    "q196_txlog_constraint_gate" ->
      """SELECT event_id, user_id, event_type, CAST(1 AS BIGINT) AS enforced
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id + 1, user_id, event_type, CAST(1 AS BIGINT)
        |FROM events WHERE event_id % 3 = 2
        |UNION ALL
        |SELECT event_id, user_id, event_type, CAST(1 AS BIGINT)
        |FROM events WHERE event_id % 3 = 1""".stripMargin,
    "q197_txlog_copy_into" ->
      """SELECT doc_id, source, CAST(3 AS BIGINT) AS n_files
        |FROM documents WHERE doc_id < 60""".stripMargin,
  )
}

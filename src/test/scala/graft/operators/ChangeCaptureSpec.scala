package graft.operators

import graft.SparkSpec

class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    ChangeCapture.scd2(
      rows.toDF("k", "ts", "id", "attr"), "k", Seq("ts", "id"), "attr")
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))

  test("hand-checked runs incl. null transitions") {
    val out = run(Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"), (1L, 50L, 5L, null), (1L, 60L, 6L, null)))
    assert(out.toSeq == Seq(
      (1L, 1L, "A", 10L, Some(30L), 2L, false),
      (1L, 2L, "B", 30L, Some(40L), 1L, false),
      (1L, 3L, "A", 40L, Some(50L), 1L, false),
      (1L, 4L, null, 50L, None, 2L, true)))
  }

  test("a key whose FIRST event has a null attr still gets a 1-based version") {
    val out = run(Seq((1L, 10L, 1L, null), (1L, 20L, 2L, "A")))
    assert(out.toSeq == Seq(
      (1L, 1L, null, 10L, Some(20L), 1L, false),
      (1L, 2L, "A", 20L, None, 1L, true)))
  }

  test("intervals tile the timeline; exactly one current version per key") {
    val rows = for {
      k <- 1L to 20L
      i <- 1L to 30L
    } yield (k, i * 10, i, s"s${(k * i) % 4}")
    val out = run(rows)
    out.groupBy(_._1).values.foreach { vs =>
      val sorted = vs.sortBy(_._2)
      // versions dense from 1
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      // half-open intervals chain: valid_to == next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4))
        case _ =>
      }
      assert(sorted.count(_._7) == 1 && sorted.last._7)
      assert(sorted.last._5.isEmpty)
    }
    // nothing lost in the collapse
    assert(out.map(_._6).sum == rows.size)
  }

  test("scd2Merge == full rebuild for every time split (incl. mid-run, boundary, new keys)") {
    // 3 keys with multi-run histories; key 3 appears only late (a key
    // new to the dimension at merge time)
    val events = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "B"), (1L, 50L, 5L, "A"),
      (2L, 15L, 6L, "X"), (2L, 25L, 7L, "Y"), (2L, 45L, 8L, "Y"),
      (3L, 35L, 9L, "Q"), (3L, 55L, 10L, "R"),
      // key 4 starts with a NULL attr and appears only late: a new key
      // whose null first-run attr must NOT null-safe-match the absent
      // current row (the `continues` isNotNull guard)
      (4L, 38L, 11L, null), (4L, 58L, 12L, "S"),
      // key 5: the reviewer cases — a null run arriving as a batch's
      // FIRST run against an existing non-null current ("A"@16 closed
      // by null@44, reopened "B"@52), and a new key whose batch is
      // ONLY a null run (key 6) — both need the 1-based-version fix
      (5L, 16L, 13L, "A"), (5L, 44L, 14L, null), (5L, 52L, 15L, "B"),
      (6L, 48L, 16L, null))
    val full = run(events)
    for (split <- Seq(12L, 20L, 28L, 34L, 42L, 50L)) {
      val before = events.filter(_._2 <= split)
      val after = events.filter(_._2 > split)
      val existing = ChangeCapture.scd2(
        before.toDF("k", "ts", "id", "attr"), "k", Seq("ts", "id"), "attr")
      val merged = ChangeCapture.scd2Merge(existing,
          after.toDF("k", "ts", "id", "attr"), "k", Seq("ts", "id"), "attr")
        .select("k", "version", "attr_value", "valid_from", "valid_to",
          "n_events", "is_current")
        .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
        .collect().sortBy(r => (r._1, r._2))
      assert(merged.toSeq == full.toSeq, s"split at $split diverges")
    }
  }

  test("scd2Merge leaves untouched keys byte-identical and passes an empty batch through") {
    val events = Seq((1L, 10L, 1L, "A"), (2L, 20L, 2L, "B"))
    val existing = ChangeCapture.scd2(
      events.toDF("k", "ts", "id", "attr"), "k", Seq("ts", "id"), "attr")
    val merged = ChangeCapture.scd2Merge(existing,
        Seq((2L, 30L, 3L, "C")).toDF("k", "ts", "id", "attr"),
        "k", Seq("ts", "id"), "attr")
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(merged.toSeq == Seq(
      (1L, 1L, "A", 10L, None, 1L, true),
      (2L, 1L, "B", 20L, Some(30L), 1L, false),
      (2L, 2L, "C", 30L, None, 1L, true)))
    val empty = ChangeCapture.scd2Merge(existing,
      Seq.empty[(Long, Long, Long, String)].toDF("k", "ts", "id", "attr"),
      "k", Seq("ts", "id"), "attr")
    assert(empty.count() == 2)
  }

  test("deterministic under duplicate timestamps (id tiebreak) and repartition") {
    val rows = Seq(
      (1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"), (1L, 20L, 3L, "A"))
    val a = run(rows)
    // order by (ts, id): A@ (10,1), B@(10,2), A@20 → three runs
    assert(a.map(r => (r._2, r._3)).toSeq == Seq(1L -> "A", 2L -> "B", 3L -> "A"))
    val df = rows.toDF("k", "ts", "id", "attr").repartition(7)
    val b = ChangeCapture.scd2(df, "k", Seq("ts", "id"), "attr")
      .select("k", "version", "attr_value", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
  }
}

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

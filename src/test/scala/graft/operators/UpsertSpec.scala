package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S9/S10/S11 upsert semantics: replay idempotency, latest-wins,
  * case-normalized keyed update (SURVEY §5 test plan).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def sales(rows: (String, Boolean, Long, Long)*) =
    rows.toDF("property_id", "is_processed", "created_date", "updated_date")

  test("insertIgnore: existing key kept, new key appended, replay idempotent") {
    val target = sales(("p1", true, 20240101L, 20240101L))
    val updates = sales(
      ("p1", false, 20240501L, 20240501L), // conflict → ignored
      ("p2", false, 20240501L, 20240501L)) // new → inserted
    val once = Upsert.insertIgnore(target, updates, Seq("property_id"))
    val rows = once.orderBy("property_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("updated_date") == 20240101L) // p1 untouched
    val twice = Upsert.insertIgnore(once, updates, Seq("property_id"))
    assert(twice.orderBy("property_id").collect().toSeq == rows.toSeq)
  }

  test("mergeByKey: later updated_date wins, replay idempotent") {
    val target = sales(("p1", false, 20240101L, 20240101L))
    val updates = sales(("p1", false, 20240101L, 20240601L))
    val merged = Upsert.mergeByKey(target, updates, Seq("property_id"),
      Seq(col("updated_date").desc))
    assert(merged.collect().head.getAs[Long]("updated_date") == 20240601L)
    val again = Upsert.mergeByKey(merged, updates, Seq("property_id"),
      Seq(col("updated_date").desc))
    assert(again.collect().toSeq == merged.collect().toSeq)
  }

  test("updateByNormalizedKey: lower(trim) match updates only set columns") {
    val target = Seq(("OX1", 0L, "old", 1L), ("OX2", 0L, "keep", 2L))
      .toDF("outcode", "area_id", "display_name", "last_updated_sale")
    val updates = Seq((" ox1 ", 42L, "Oxford Central"))
      .toDF("outcode", "area_id", "display_name")
    val out = Upsert.updateByNormalizedKey(target, updates, "outcode",
      Seq("area_id", "display_name"))
    val m = out.collect().map(r => r.getAs[String]("outcode") ->
      (r.getAs[Long]("area_id"), r.getAs[String]("display_name"),
        r.getAs[Long]("last_updated_sale"))).toMap
    assert(m("OX1") == ((42L, "Oxford Central", 1L))) // updated, untouched col kept
    assert(m("OX2") == ((0L, "keep", 2L)))            // unmatched row unchanged
  }

  test("workqueue sentinels: null-or-zero and stale-or-never") {
    val areas = Seq(("a", Some(5L)), ("b", None), ("c", Some(0L)))
      .toDF("outcode", "area_id")
    val eligible = areas.filter(WorkQueue.nullOrZero("area_id"))
      .select("outcode").as[String].collect().toSet
    assert(eligible == Set("b", "c"))
  }
}

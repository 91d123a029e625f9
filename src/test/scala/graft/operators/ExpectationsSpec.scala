package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("row rules: nulls fail strict predicates; counts are per-rule") {
    val df = Seq(
      (Some(5.0), Some("A")), (Some(60.0), Some("N")),
      (None, Some("R")), (Some(10.0), None))
      .toDF("qty", "flag")
    val r = check(df, Seq(
      notNull("qty_nn", "qty"),
      between("qty_1_50", "qty", lit(1.0), lit(50.0)),
      inSet("flag_dom", "flag", Seq("A", "N", "R"))))
      .as[(String, Long, Long)].collect().toSeq
    // strict three-valued logic: the null qty fails the range rule
    // too, and the null flag fails set membership
    assert(r == Seq(("qty_nn", 1L, 4L), ("qty_1_50", 2L, 4L),
      ("flag_dom", 1L, 4L)))
  }

  test("unique key: violations count rows beyond the first per duplicate group") {
    val df = Seq((1L, 1), (1L, 1), (1L, 1), (2L, 1), (3L, 2))
      .toDF("k", "sub")
    val r = check(df, Seq(UniqueKey("pk", Seq("k", "sub"))))
      .as[(String, Long, Long)].head()
    assert(r == (("pk", 2L, 5L)))
  }

  test("referential integrity: orphans counted, null keys exempt") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = check(child,
      Seq(RefIntegrity("fk_ref", Seq("fk"), parent, Seq("pk"))))
      .as[(String, Long, Long)].head()
    assert(r == (("fk_ref", 1L, 4L)))
  }

  test("report preserves caller rule order and mixes rule kinds") {
    val df = Seq((1L, 5.0), (2L, -1.0)).toDF("k", "v")
    val parent = Seq(1L).toDF("pk")
    val r = check(df, Seq(
      RefIntegrity("ref", Seq("k"), parent, Seq("pk")),
      Expect("v_pos", col("v") > 0.0),
      UniqueKey("uk", Seq("k"))))
      .as[(String, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq("ref", "v_pos", "uk"))
    assert(r.map(_._2) == Seq(1L, 1L, 0L))
  }

  test("sf0.001 lineitem: FK integrity holds; the synthetic line numbers DO collide") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
    val r = check(li, Seq(
      UniqueKey("order_line_unique", Seq("l_orderkey", "l_linenumber")),
      RefIntegrity("orderkey_in_orders", Seq("l_orderkey"),
        graft.core.Tables.orders(spark, sf0001), Seq("o_orderkey"))))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r("orderkey_in_orders") == 0L)
    // the driver's generator reuses line numbers within an order —
    // a REAL violation the gate catches (1401 dup rows at sf0.001);
    // q134's oracle replays the same count bit-for-bit
    assert(r("order_line_unique") > 0L)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (key, t, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0), ("B", 15L, 9.0)
  ).toDF("sym", "t", "px")
  private val trades = Seq( // (key, t, qty)
    ("A", 9L, 5L),   // before any quote → null
    ("A", 20L, 6L),  // equal timestamp → inclusive match (px=2)
    ("A", 25L, 7L),  // between → latest earlier (px=2)
    ("A", 99L, 8L),  // after all → px=3
    ("B", 16L, 9L),  // other key isolation → px=9
    ("C", 1L, 1L)    // key with no right rows → null
  ).toDF("sym", "t", "qty")

  test("backward as-of: inclusive, latest-earlier, key-isolated, null when none") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"),
        col("t"), col("t"), Seq("px"))
      .select(col("sym"), col("qty"), col("asof_px"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("A", 5L)).isEmpty)
    assert(out(("A", 6L)).contains(2.0))
    assert(out(("A", 7L)).contains(2.0))
    assert(out(("A", 8L)).contains(3.0))
    assert(out(("B", 9L)).contains(9.0))
    assert(out(("C", 1L)).isEmpty)
  }

  test("inner mode drops unmatched lefts") {
    val n = AsOfJoin.backward(trades, quotes, Seq("sym"),
      col("t"), col("t"), Seq("px"), leftOuter = false).count()
    assert(n == 4)
  }
}

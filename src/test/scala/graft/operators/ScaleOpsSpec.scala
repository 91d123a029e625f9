package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Schemas
import graft.sources.BucketedTable

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join, multiplicity preserved") {
    // hot key: 'h' appears 1000x on probe, 3x on build (inner join → 3000)
    val probe = ((1 to 1000).map(i => ("h", i.toLong)) ++ Seq(("c", 1L), ("d", 2L)))
      .toDF("k", "pid")
    val build = Seq(("h", "b1"), ("h", "b2"), ("h", "b3"), ("c", "b4"))
      .toDF("k", "bval")
    val plain = probe.join(build, Seq("k"))
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedJ = SkewJoin.salted(probe, build, Seq("k"), col("pid"), n = 8)
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedJ == plain)
    assert(saltedJ("h") == 3000L)
  }

  test("quarantine split: rejects carry reasons, clean+rejects partition input") {
    val raw = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      mkRow("{A}", "100", "2017-03-10 00:00", "OX1 1AA"),
      mkRow("{B}", "bad", "2017-03-10 00:00", "OX1 1AA"),
      mkRow("{C}", "100", "nope", "OX1 1AA"),
      mkRow("{D}", "100", "2017-03-10 00:00", null))), Schemas.pricePaidCsv)
    val (clean, rejects) = Clean.pricePaidWithRejects(raw)
    assert(clean.select("transaction_unique_identifier").as[String]
      .collect().toSeq == Seq("A"))
    val reasons = rejects.select("transaction_unique_identifier", "reject_reason")
      .as[(String, String)].collect().toMap
    assert(reasons == Map("B" -> "bad_price", "C" -> "bad_date",
      "D" -> "null_postcode"))
  }

  test("bucketed tables join without exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val o = graft.core.Tables.orders(spark, sf0001)
    val c = graft.core.Tables.customer(spark, sf0001)
    BucketedTable.save(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_custkey"), buckets = 4)
    BucketedTable.save(c.select("c_custkey", "c_name"),
      "customer_b", Seq("c_custkey"), buckets = 4)
    val j = BucketedTable.read(spark, "orders_b")
      .join(BucketedTable.read(spark, "customer_b"),
        col("o_custkey") === col("c_custkey"))
    // disable broadcast so the co-located strategy is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  private def mkRow(tui: String, price: String, date: String, pc: String): Row =
    Row(tui, price, date, pc, "T", "N", "F", "12", "", "X", "",
      "OXFORD", "OXFORD", "OXFORDSHIRE", "A", "A")
}

package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Brute-force pins for the market-basket rules and BFS hop levels. */
class GraphOpsSpec extends SparkSpec {

  private val basketSchema = StructType(Seq(
    StructField("g", LongType, nullable = false),
    StructField("i", LongType, nullable = false)))

  private def baskets(pairs: (Long, Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pairs.map { case (g, i) => Row(g, i) }.asJava, basketSchema)
  }

  test("pairRules: hand-computed fixed-point rule table") {
    // baskets: {1,2,3}, {1,2}, {1,3}, {2} (+ a dup row) → 4 baskets
    val df = baskets(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (12L, 3L),
      (13L, 2L))
    val out = MarketBasket.pairRules(df, "g", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val r12 = out((1L, 2L))
    assert(r12.getAs[Long]("cooc") === 2L)
    assert(r12.getAs[Long]("n_a") === 3L) // item 1 in baskets 10,11,12
    assert(r12.getAs[Long]("n_b") === 3L) // item 2 in baskets 10,11,13
    assert(r12.getAs[Long]("n_baskets") === 4L)
    assert(r12.getAs[Long]("support_e6") === 500000L)  // 2/4
    assert(r12.getAs[Long]("conf_a_b_e6") === 666666L) // 2/3 truncated
    assert(r12.getAs[Long]("conf_b_a_e6") === 666666L)
    assert(r12.getAs[Long]("lift_e6") === 888888L)     // (2*4)/(3*3)
    val r23 = out((2L, 3L))
    assert(r23.getAs[Long]("cooc") === 1L)
    assert(r23.getAs[Long]("lift_e6") === 666666L)     // (1*4)/(3*2)
    // minCooc floor prunes before the joins: (1,2) and (1,3) both
    // co-occur twice, (2,3) only once
    assert(MarketBasket.pairRules(df, "g", "i", minCooc = 2L)
      .collect().length === 2)
  }

  test("hopLevels: min-distance on a known shape, frontier stops at the cap") {
    val edgeSchema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    // path 0-1-2-3-4 plus a shortcut 0-3 and an island 9-10
    val edges = spark.createDataFrame(Seq(
      Row(0L, 1L), Row(1L, 2L), Row(2L, 3L), Row(3L, 4L),
      Row(0L, 3L), Row(9L, 10L)).asJava, edgeSchema)
    def seedDf(vs: Long*) = spark.createDataFrame(
      vs.map(Row(_)).asJava,
      StructType(Seq(StructField("v", LongType, nullable = false))))

    val lv = ShortestPaths.hopLevels(edges, seedDf(0L), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortcut wins: 3 is one hop from 0, 4 is two
    assert(lv === Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2))

    val capped = ShortestPaths.hopLevels(edges, seedDf(0L), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped === Map(0L -> 0, 1L -> 1, 3L -> 1))

    // multi-source: levels are min over seeds; islands reachable from
    // their own seed only
    val multi = ShortestPaths.hopLevels(edges, seedDf(4L, 9L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi === Map(4L -> 0, 9L -> 0, 3L -> 1, 10L -> 1,
      2L -> 2, 0L -> 2))
  }
}

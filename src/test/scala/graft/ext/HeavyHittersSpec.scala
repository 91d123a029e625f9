package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("planted heavy hitter always surfaces in the freqItems sketch") {
    // "hot" is ~25% of all tokens — far above the 5% support, so the
    // Misra-Gries superset guarantee requires it in the sketch under
    // any partitioning
    val docs = (1L to 40L).map(i => s"hot unique$i filler${i % 7} pad${i % 11}")
    val tok = docs.toDF("text")
      .select(explode(split(col("text"), " ")).as("term"))
    val items = tok.stat.freqItems(Seq("term"), 0.05)
      .select(explode(col("term_freqItems")).as("t"))
      .as[String].collect().toSet
    assert(items.contains("hot"), s"sketch missed the planted heavy hitter: $items")
  }

  test("q63 invariant holds on the sf0.001 fixtures (zero violations)") {
    val violations = graft.SparkEntry
      .queries("q63_heavy_hitters_superset")(spark, sf0001)
    assert(violations.count() == 0)
  }

  test("q63 is not vacuous: the fixture corpus HAS exact heavy hitters at the support") {
    // the invariant only means something if the left side is non-empty
    val tok = graft.core.Tables.documents(spark, sf0001)
      .select(explode(split(
        graft.functions.TextFunctions.normalized(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val n = tok.count()
    val hh = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n * 0.02).count()
    assert(hh > 0, "no exact heavy hitters at support 0.02 — invariant vacuous")
  }
}

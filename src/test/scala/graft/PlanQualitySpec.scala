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
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("gapless 1..n in order; equals the single-partition window result") {
    val df = (1L to 5000L).map(i => ((i * 7919) % 5003, i)).toDF("k", "tie")
    val out = Ids.globalRowNumber(df, Seq("k", "tie"))
      .select("k", "tie", "row_num").as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sorted.toSeq == (1L to 5000L).toSeq)
    val expected = out.sortBy(r => (r._1, r._2)).zipWithIndex
      .map { case (r, i) => (r._1, r._2, i + 1L) }
    assert(out.sortBy(r => (r._1, r._2)).toSeq == expected.toSeq)
  }

  test("deterministic under input repartitioning") {
    val df = (1L to 2000L).map(i => ((i * 31) % 997, i)).toDF("k", "tie")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ids.globalRowNumber(d, Seq("k", "tie"))
        .select("k", "tie", "row_num").as[(Long, Long, Long)].collect().toSet
    assert(run(df) == run(df.repartition(17)))
  }

  test("empty input yields an empty numbered frame (offset map literal survives)") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "tie")
    val out = Ids.globalRowNumber(empty, Seq("k", "tie"))
    assert(out.count() == 0)
    assert(out.columns.contains("row_num"))
  }

  test("plan shape: range partitioning, never a single-partition exchange") {
    val df = (1L to 100L).map(i => (i % 13, i)).toDF("k", "tie")
    val out = Ids.globalRowNumber(df, Seq("k", "tie"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"global numbering fell into the one-task trap:\n$p")
  }
}

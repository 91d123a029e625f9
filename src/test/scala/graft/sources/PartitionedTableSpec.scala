package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def table() = new PartitionedTable(spark,
    Files.createTempDirectory("ptable").toString, Seq("event_type"))

  test("partition filters prune at planning time; data filters stay pushed") {
    val t = table()
    t.write(Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0))
      .toDF("id", "event_type", "value"))
    val q = t.read().filter(col("event_type") === "click" && col("value") > 2.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("event_type") && plan.contains("= click)"), plan)
    // the partition column is directory metadata, not a data filter
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,2.0)]"), plan)
    assert(q.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val t = table()
    t.write(Seq((1L, "click", 1.0), (2L, "view", 2.0))
      .toDF("id", "event_type", "value"))
    // replay the click partition with corrected rows; view must survive
    t.overwritePartitions(Seq((10L, "click", 9.0), (11L, "click", 8.0))
      .toDF("id", "event_type", "value"))
    val got = t.read().select("id", "event_type").as[(Long, String)]
      .collect().toSet
    assert(got == Set((10L, "click"), (11L, "click"), (2L, "view")))
    // idempotent: replaying the same batch changes nothing
    t.overwritePartitions(Seq((10L, "click", 9.0), (11L, "click", 8.0))
      .toDF("id", "event_type", "value"))
    assert(t.read().count() == 3)
  }

  test("append lands only in the touched partition") {
    val t = table()
    t.write(Seq((1L, "click", 1.0), (2L, "view", 2.0))
      .toDF("id", "event_type", "value"))
    t.append(Seq((3L, "view", 5.0)).toDF("id", "event_type", "value"))
    assert(t.read().filter(col("event_type") === "view").count() == 2)
    assert(t.read().count() == 3)
  }
}

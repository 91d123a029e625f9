package graft.functions

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class ParquetFooterSpec extends SparkSpec {
  import ParquetFooter._

  test("real pyarrow-written file: magic, schema names, row count") {
    val bytes = Files.readAllBytes(Paths.get(s"$sf0001/region.parquet"))
    val m = footer(bytes).get
    assert(m.numRows == 5L)
    val leafNames = m.schema.filter(_.numChildren == 0).map(_.name)
    assert(leafNames == Vector("r_regionkey", "r_name"))
    assert(m.rowGroups.map(_.numRows).sum == 5L)
    // every chunk accounts for every row (flat schema)
    m.rowGroups.flatMap(_.columns).foreach(c => assert(c.numValues == 5L))
  }

  test("Spark-written file: stats agree with recomputing from data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqfooter").toString + "/t"
    val rows = (0L until 1000L)
      .map(i => (i, if (i % 7 == 0) None else Some(i * 3 - 500), s"s$i"))
    rows.toDF("id", "v", "s").coalesce(1).write.parquet(dir)
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    val m = footer(Files.readAllBytes(Paths.get(file))).get
    assert(m.numRows == 1000L)
    assert(m.createdBy.exists(_.contains("parquet-mr")))
    val byPath = m.rowGroups.flatMap(_.columns).groupBy(_.path)
    // id: INT64, no nulls, min 0, max 999
    val id = byPath("id")
    assert(id.map(_.numValues).sum == 1000L)
    assert(id.flatMap(_.nullCount).sum == 0L)
    assert(id.flatMap(c => c.minValue.flatMap(statAsLong(c.physicalType, _))).min == 0L)
    assert(id.flatMap(c => c.maxValue.flatMap(statAsLong(c.physicalType, _))).max == 999L)
    // v: nulls at multiples of 7; min is negative (sign decode)
    val v = byPath("v")
    val expectNulls = (0L until 1000L).count(_ % 7 == 0)
    assert(v.flatMap(_.nullCount).sum == expectNulls.toLong)
    assert(v.flatMap(c => c.minValue.flatMap(statAsLong(c.physicalType, _))).min == -497L)
    assert(v.flatMap(c => c.maxValue.flatMap(statAsLong(c.physicalType, _))).max == 999L * 3 - 500)
    // s: BYTE_ARRAY chunk present with all values
    assert(byPath("s").head.physicalType == "BYTE_ARRAY")
    assert(byPath("s").map(_.numValues).sum == 1000L)
  }

  test("compression codec surfaces") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqfooterz").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("x", "y").coalesce(1)
      .write.option("compression", "gzip").parquet(dir)
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val m = footer(Files.readAllBytes(Paths.get(file))).get
    assert(m.rowGroups.flatMap(_.columns).forall(_.codec == "GZIP"))
  }

  test("total on garbage, truncation, lying length") {
    assert(footer(null).isEmpty)
    assert(footer("PAR1".getBytes).isEmpty)
    assert(footer("PAR1 not really a parquet file PAR1".getBytes).isEmpty)
    val bytes = Files.readAllBytes(Paths.get(s"$sf0001/region.parquet"))
    assert(footer(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 6)).isEmpty)
    // corrupt the footer length so it overruns the file
    val bad = bytes.clone()
    bad(bytes.length - 5) = 0x7f
    assert(footer(bad).isEmpty)
  }
}

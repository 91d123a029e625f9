package graft.functions

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class ParquetPagesSpec extends SparkSpec {
  import ParquetPages._

  private def writeAndRead(compression: String, dictionary: Boolean,
      v2: Boolean = false): (String, Array[Byte]) = {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.enable.dictionary")
    val prevVer = hc.get("parquet.writer.version")
    hc.set("parquet.enable.dictionary", dictionary.toString)
    hc.set("parquet.writer.version",
      if (v2) "PARQUET_2_0" else "PARQUET_1_0")
    try {
      val dir = Files.createTempDirectory("pqpages").toString + "/t"
      (0L until 500L)
        .map(i => (i, if (i % 7 == 0) None else Some(i * 3 - 100),
          s"str${i % 50}", i % 3 == 0, (i % 10).toDouble / 4))
        .toDF("id", "v", "s", "flag", "d")
        .coalesce(1)
        .write.option("compression", compression).parquet(dir)
      val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      (dir, Files.readAllBytes(Paths.get(file)))
    } finally {
      if (prev == null) hc.unset("parquet.enable.dictionary")
      else hc.set("parquet.enable.dictionary", prev)
      if (prevVer == null) hc.unset("parquet.writer.version")
      else hc.set("parquet.writer.version", prevVer)
    }
  }

  private def check(bytes: Array[Byte]): Unit = {
    val id = readInt64Column(bytes, "id").get
    assert(id == (0L until 500L).map(i => Some(i)).toVector)
    val v = readInt64Column(bytes, "v").get
    assert(v == (0L until 500L)
      .map(i => if (i % 7 == 0) None else Some(i * 3 - 100)).toVector)
    val s = readColumn(bytes, "s").get
    assert(s == (0L until 500L).map(i => Some(s"str${i % 50}")).toVector)
    val flag = readColumn(bytes, "flag").get
    assert(flag == (0L until 500L).map(i => Some(i % 3 == 0)).toVector)
    val d = readColumn(bytes, "d").get
    assert(d == (0L until 500L).map(i => Some((i % 10).toDouble / 4)).toVector)
  }

  test("uncompressed + dictionary: full column reconstruction") {
    check(writeAndRead("none", dictionary = true)._2)
  }

  test("gzip pages + dictionary") {
    check(writeAndRead("gzip", dictionary = true)._2)
  }

  test("PLAIN pages (dictionary disabled)") {
    check(writeAndRead("none", dictionary = false)._2)
  }

  test("gzip + PLAIN") {
    check(writeAndRead("gzip", dictionary = false)._2)
  }

  test("agrees with Spark's own reader on every cell") {
    import spark.implicits._
    val (dir, bytes) = writeAndRead("gzip", dictionary = true)
    val fromSpark = spark.read.parquet(dir)
      .select("id", "v").as[(Long, Option[Long])].collect()
      .sortBy(_._1).toVector
    val id = readInt64Column(bytes, "id").get.map(_.get)
    val v = readInt64Column(bytes, "v").get
    assert(id.zip(v).sortBy(_._1) == fromSpark.map { case (a, b) => (a, b) })
  }

  test("snappy pages (the default codec) via our raw-block decode") {
    check(writeAndRead("snappy", dictionary = true)._2)
    check(writeAndRead("snappy", dictionary = false)._2)
  }

  test("zstd pages via the classpath zstd-jni") {
    check(writeAndRead("zstd", dictionary = true)._2)
  }

  test("lz4_raw pages via the classpath lz4-java") {
    check(writeAndRead("lz4_raw", dictionary = true)._2)
  }

  test("v2 pages, delta encodings (dictionary off): DBP ints, DBA strings, RLE bools") {
    check(writeAndRead("none", dictionary = false, v2 = true)._2)
    check(writeAndRead("snappy", dictionary = false, v2 = true)._2)
  }

  test("v2 pages with dictionary (levels outside compression)") {
    check(writeAndRead("gzip", dictionary = true, v2 = true)._2)
  }

  test("total on truncation and unknown column") {
    val bytes = writeAndRead("none", dictionary = true)._2
    assert(readColumn(bytes, "nope").isEmpty)
    assert(readColumn(java.util.Arrays.copyOfRange(bytes, 0, 100), "id").isEmpty)
  }
}

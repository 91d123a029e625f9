package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed Morton code") {
    // 3 = 011, 5 = 101 (bits=3, k=2, col0 at even positions):
    // j=0: p→1<<0, s→1<<1; j=1: p→1<<2, s→0; j=2: p→0, s→1<<5
    // = 1 + 2 + 4 + 32 = 39
    val z = Seq(1).toDF("x")
      .select(ZOrder.interleave(Seq(lit(3L), lit(5L)), 3).as("z"))
      .as[Long].collect().head
    assert(z == 39L)
  }

  test("rangeBucket: min at 0, max strictly below 2^bits; degenerate range is 0") {
    val df = Seq(0L, 199L, 100L).toDF("x")
    val b = df.select(ZOrder.rangeBucket($"x", 0L, 199L, 8).as("b"))
      .as[Long].collect().toSeq
    // max → floor(199·256/200) = 254: the formula guarantees < 2^bits,
    // hitting 2^bits−1 exactly only when range+1 divides the bucket count
    assert(b(0) == 0L && b(1) == 254L)
    assert(b(2) == (100L * 256 / 200))
    val d = df.select(ZOrder.rangeBucket($"x", 5L, 5L, 8).as("b"))
      .as[Long].collect().toSet
    assert(d == Set(0L))
  }

  test("z-layout clusters a 2-dimensional box into fewer files than round-robin") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val work = Files.createTempDirectory("zorder")
    try {
      li.repartition(8).write.parquet(s"$work/naive")
      ZOrder.layoutBy(li, Seq("l_partkey", "l_suppkey"), bits = 8, nFiles = 8)
        .write.parquet(s"$work/zorder")
      def filesTouched(path: String): Long = spark.read.parquet(path)
        .filter($"l_partkey".between(10, 30) && $"l_suppkey".between(2, 4))
        .select(input_file_name()).distinct().count()
      val naive = filesTouched(s"$work/naive")
      val z = filesTouched(s"$work/zorder")
      assert(naive >= 7, s"round-robin should smear the box over ~all files, got $naive")
      assert(z < naive,
        s"z-order must cluster the box into fewer files: z=$z naive=$naive")
    } finally {
      import scala.reflect.io.Directory
      new Directory(work.toFile).deleteRecursively()
    }
  }

  test("string dimensions: orderKey preserves UTF-8 order; z-layout prunes string ranges") {
    // order preservation across lengths, prefixes, and code points
    val words = Seq("", "a", "ab", "b", "ba", "zz", "zzz", "é")
    val keyed = words.toDF("s")
      .select(col("s"), ZOrder.orderKey(col("s"),
        org.apache.spark.sql.types.StringType).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sortedByKey = words.sortBy(keyed)
    val sortedBinary = words.sorted // JVM String order = code-point order
    assert(sortedByKey == sortedBinary,
      s"key order $sortedByKey != binary order $sortedBinary")

    // end-to-end: a txlog table z-ordered on (string source, numeric id)
    // prunes BOTH dimensions through manifest stats
    val root = Files.createTempDirectory("zorder_str").toString
    val t = new TxLogTable(spark, root)
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("lang"))
    t.ensureExists(docs.schema)
    t.append(docs)
    t.compactZOrdered(Seq("source", "doc_id"), numFiles = 8)
    val all = t.scanPathsAt(t.currentVersion, lit(true)).size
    assert(all == 8)
    val srcs = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val oneSrc = t.scanPathsAt(t.currentVersion,
      col("source") === srcs.head).size
    val oneId = t.scanPathsAt(t.currentVersion,
      col("doc_id") === 7L).size
    assert(oneSrc < all, s"string dim did not prune: $oneSrc/$all")
    assert(oneId < all, s"numeric dim did not prune: $oneId/$all")
    // soundness: pruned read == full filter
    assert(t.readWhere(col("source") === srcs.head).count() ==
      docs.filter(col("source") === srcs.head).count())
  }

  test("withZValue on an empty frame raises a clear error, not an NPE") {
    val li = Tables.lineitem(spark, sf0001).filter($"l_partkey" < 0)
    val e = intercept[IllegalArgumentException] {
      ZOrder.withZValue(li, Seq("l_partkey", "l_suppkey"), bits = 8)
    }
    assert(e.getMessage.contains("no rows"))
  }
}

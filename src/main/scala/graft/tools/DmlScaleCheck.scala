package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Touched-file DML scaling evidence: the SAME fixed-size delta
  * (10k keys) merged / updated / deleted against a clustered txlog
  * table built at sf0.1 and at the ScaleUp sf1 (10× rows). With
  * copy-on-write at FILE granularity the commit cost must track the
  * DELTA (files rewritten ≈ flat), not the table — the r16 full-
  * snapshot rewrite would go ~10× instead. Each op: min of two
  * passes on a fresh table; prints wall seconds + files rewritten
  * (`TxLogTable.lastDmlRewritten`) per scale. Results land in
  * BASELINE.md.
  *
  * Usage: runMain graft.tools.DmlScaleCheck [sf1Dir]
  */
object DmlScaleCheck {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.TxLogTable

    def bench(dir: String, label: String): Unit = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val nRows = li.count()
      // ~64 files per sf0.1-sized table, ~640 at sf1 — the file count
      // scales with the table exactly as a real ingest's would
      val files = math.max(8L, nRows / 25000L).toInt
      // FIXED delta: the same 10k keys at both scales (keys exist in
      // both tables — ScaleUp's copy 0 is sf0.1 verbatim; the < 1e9
      // guard stays inside copy 0 at sf1)
      val deltaKeys = 10000
      def freshTable(): TxLogTable = {
        val root = java.nio.file.Files
          .createTempDirectory("dml_scale").toString
        val t = new TxLogTable(spark, root)
        t.ensureExists(li.schema)
        t.append(li)
        t.compactClustered(Seq("l_orderkey"), files,
          statsCols = Seq("l_orderkey"))
        t
      }
      val delta = li
        .filter(col("l_orderkey") % 6001 === 1 &&
          col("l_orderkey") < 1000000000L)
        .dropDuplicates("l_orderkey")
        .limit(deltaKeys)
        .withColumn("l_quantity", col("l_quantity") * 2)
        .cache()
      val nDelta = delta.count()
      // update/delete predicate: a FIXED key range (skipping-visible —
      // a `%` predicate would defeat the stats evaluator), same rows
      // at both scales
      val rangePred = col("l_orderkey").between(1L, 60000L)

      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def spot(name: String)(op: TxLogTable => Unit): Unit = {
        val samples = (1 to 2).map { _ =>
          val t = freshTable()
          val s = time(op(t))
          (s, TxLogTable.lastDmlRewritten)
        }
        val best = samples.minBy(_._1)
        println(f"[dmlscale] $label%5s $name%-12s ${best._1}%7.2f s  " +
          f"rewritten=${best._2}%5d / $files files  " +
          f"(rows=$nRows%,d delta=$nDelta%,d)")
      }
      spot("merge")(_.merge(delta, Seq("l_orderkey"),
        Seq(col("l_quantity").desc), statsCols = Seq("l_orderkey")))
      // the purely delta-proportional arm: the caller asserts key
      // uniqueness, skipping the dup-key census scan
      spot("merge-uniq")(_.merge(delta, Seq("l_orderkey"),
        Seq(col("l_quantity").desc), statsCols = Seq("l_orderkey"),
        assumeKeyUnique = true))
      spot("update")(_.update(rangePred,
        Map("l_quantity" -> (col("l_quantity") + 1)),
        statsCols = Seq("l_orderkey")))
      spot("delete")(_.delete(rangePred,
        statsCols = Seq("l_orderkey")))
      delta.unpersist()
    }

    bench("/root/testdata/sf0.1", "sf0.1")
    bench(sf1, "sf1")
    spark.stop()
  }
}

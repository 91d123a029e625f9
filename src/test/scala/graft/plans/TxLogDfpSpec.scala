package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.{TxLogRelation, TxLogTable}

/** Dynamic file pruning for txlog joins: the preCBO rewrite executes a
  * small dim side's keys at planning time and restricts the fact
  * relation's file list through the manifest stats. Pinned here:
  * effectiveness (files actually skipped), correctness (result equal
  * to the unpruned join), the safety backoffs, and the production
  * seam (a withExtensions session prunes plain DataFrame joins with
  * no explicit call).
  */
class TxLogDfpSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("payload", LongType, nullable = true)))

  /** A 10-file range-clustered fact: file i holds k ∈ [100i, 100i+99]. */
  private def seedFact(prefix: String): (String, TxLogTable) = {
    val root = Files.createTempDirectory(prefix).toString
    val t = new TxLogTable(spark, root)
    t.ensureExists(factSchema)
    import spark.implicits._
    t.append((0L until 1000L).map(k => (k, k * 7)).toDF("k", "payload"))
    t.compactClustered(Seq("k"), numFiles = 10, statsCols = Seq("k"))
    (root, t)
  }

  private def dim(ks: Long*) = {
    import spark.implicits._
    ks.map(k => (k, s"d$k")).toDF("dk", "tag")
  }

  test("a 3-row dim prunes the fact scan to the files its keys can touch") {
    val (root, _) = seedFact("dfp_eff")
    val fact = spark.read.format("txlog").load(root)
    val joined = fact.join(dim(5L, 105L, 907L), fact("k") === col("dk"))
      .select(col("k"), col("tag"), col("payload"))
    TxLogDynamicFilePruning.lastPrune = None
    val pruned = TxLogDynamicFilePruning.prune(joined)
    val rows = pruned.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((5L, "d5", 35L), (105L, "d105", 735L),
      (907L, "d907", 6349L)))
    // effectiveness: 3 keys live in 3 of the 10 range-clustered files
    assert(TxLogDynamicFilePruning.lastPrune.contains((3, 10)),
      s"lastPrune=${TxLogDynamicFilePruning.lastPrune}")
    // and the scan itself read only those files
    assert(TxLogRelation.lastScan == (3, 10),
      s"lastScan=${TxLogRelation.lastScan}")
    // result identical to the unpruned join
    assert(joined.orderBy("k").collect().toSeq ==
      pruned.orderBy("k").collect().toSeq)
  }

  test("null and empty dim key sets prune to nothing without changing semantics") {
    val (root, _) = seedFact("dfp_null")
    val fact = spark.read.format("txlog").load(root)
    import spark.implicits._
    val nullDim = Seq[(java.lang.Long, String)]((null, "x"))
      .toDF("dk", "tag")
    val j = fact.join(nullDim, fact("k") === col("dk"))
    TxLogDynamicFilePruning.lastPrune = None
    assert(TxLogDynamicFilePruning.prune(j).count() == 0)
    // the rule pruned the scan to ZERO files (null keys match nothing);
    // downstream the optimizer may then collapse the join entirely
    assert(TxLogDynamicFilePruning.lastPrune.contains((0, 10)),
      s"lastPrune=${TxLogDynamicFilePruning.lastPrune}")
  }

  test("over the IN-set cap the predicate degrades to a range, not a full scan") {
    val (root, _) = seedFact("dfp_range")
    val fact = spark.read.format("txlog").load(root)
    // 20 contiguous keys inside file 3's range [300, 399]
    val d = dim((300L until 320L): _*)
    spark.conf.set("spark.graft.txlog.dfp.maxKeys", "5")
    try {
      TxLogDynamicFilePruning.lastPrune = None
      val pruned = TxLogDynamicFilePruning.prune(
        fact.join(d, fact("k") === col("dk"))
          .select(col("k"), col("payload")))
      assert(pruned.count() == 20)
      // range [300, 319] proves only file 3 can match
      assert(TxLogDynamicFilePruning.lastPrune.contains((1, 10)),
        s"lastPrune=${TxLogDynamicFilePruning.lastPrune}")
    } finally spark.conf.unset("spark.graft.txlog.dfp.maxKeys")
  }

  test("backoffs: outer joins, computed keys, nondeterministic dims stay unpruned") {
    val (root, _) = seedFact("dfp_backoff")
    val fact = spark.read.format("txlog").load(root)
    val d = dim(5L)
    def overrideCount(df: org.apache.spark.sql.DataFrame): Int =
      new TxLogDynamicFilePruning(spark)
        .apply(df.queryExecution.analyzed).collect {
          case org.apache.spark.sql.execution.datasources
              .LogicalRelation(r: TxLogRelation, _, _, _, _)
              if r.pathsOverride.isDefined => r
        }.size
    // outer join: unmatched fact rows must survive → never pruned
    assert(overrideCount(
      fact.join(d, fact("k") === d("dk"), "left_outer")) == 0)
    // computed key (k+1): not a relation output attribute
    assert(overrideCount(
      fact.withColumn("k2", col("k") + 1)
        .join(d, col("k2") === d("dk"))) == 0)
    // nondeterministic dim: re-execution could under-cover
    assert(overrideCount(
      fact.join(d.filter(rand(7) >= -1), fact("k") === d("dk"))) == 0)
    // row-set-sensitive operator between scan and join: a Window's
    // output (rn) depends on which rows reach it, so pruning beneath
    // it would silently change values — the descent must refuse
    val w = org.apache.spark.sql.expressions.Window.orderBy("payload")
    assert(overrideCount(
      fact.withColumn("rn", row_number().over(w))
        .join(d, fact("k") === d("dk"))) == 0)
    // LIMIT between scan and join: which-500-rows changes under pruning
    assert(overrideCount(
      fact.limit(500).join(d, fact("k") === d("dk"))) == 0)
    // SAMPLE between scan and join: sampled row set is position-derived
    assert(overrideCount(
      fact.sample(0.9, 7L).join(d, fact("k") === d("dk"))) == 0)
    // non-snapshot dim leaf (RDD-backed — not provably pinned between
    // the planning-time key collect and the execution-time build)
    val rddDim = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(5L, "d5"))),
      StructType(Seq(StructField("dk", LongType, nullable = false),
        StructField("tag", StringType, nullable = true))))
    assert(overrideCount(
      fact.join(rddDim, fact("k") === col("dk"))) == 0)
    // but per-row nodes (Filter/Project) on the fact side still prune
    assert(overrideCount(
      fact.filter(col("payload") >= 0).select(col("k"))
        .join(d, col("k") === d("dk"))) == 1)
    // inner equi-join DOES rewrite (the positive control)
    assert(overrideCount(fact.join(d, fact("k") === d("dk"))) == 1)
    // disabled by conf: no rewrite
    spark.conf.set("spark.graft.txlog.dfp.enabled", "false")
    try assert(overrideCount(fact.join(d, fact("k") === d("dk"))) == 0)
    finally spark.conf.unset("spark.graft.txlog.dfp.enabled")
  }

  test("production seam: a withExtensions session prunes plain DataFrame joins") {
    val base = spark
    val (root, _) = seedFact("dfp_ext")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val fact = s2.read.format("txlog").load(root)
      val d = s2.createDataFrame(
        java.util.List.of(Row(305L, "d305")),
        StructType(Seq(StructField("dk", LongType, nullable = false),
          StructField("tag", StringType, nullable = true))))
      TxLogDynamicFilePruning.lastPrune = None
      // NO explicit prune() — the injected preCBO rule must fire
      val got = fact.join(d, fact("k") === d("dk"))
        .select(col("k"), col("payload")).collect()
      assert(got.toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((305L, 2135L)))
      assert(TxLogDynamicFilePruning.lastPrune.contains((1, 10)),
        s"lastPrune=${TxLogDynamicFilePruning.lastPrune}")
      assert(TxLogRelation.lastScan == (1, 10))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

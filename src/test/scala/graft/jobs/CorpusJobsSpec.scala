package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import graft.orchestration.TaskGraph
import graft.sources.ParquetTable

class CorpusJobsSpec extends SparkSpec {
  import spark.implicits._

  test("buildTrainingSet: filters, dedups, budgets and splits hold; fully deterministic") {
    val work = Files.createTempDirectory("corpus").toString
    val budgets = Map("src0" -> 400L, "src1" -> 300L, "src2" -> 250L)

    def runAll(out: String): Unit = {
      val r = TaskGraph.run(CorpusJobs.buildTrainingSet(
        s"$sf001/documents.parquet", out, budgets = budgets), spark)
      assert(r.succeeded, r.states)
    }
    runAll(s"$work/a")
    val ts = new ParquetTable(spark, s"$work/a/training_set").read().cache()

    // filters: language, quality, token floor
    val checks = ts.select(
      (T.langId($"text") === "en").as("lang_ok"),
      (T.qualityScore($"text") >= 0.25).as("q_ok"),
      (T.tokenCount($"text") >= 10).as("t_ok"))
      .agg(min("lang_ok"), min("q_ok"), min("t_ok")).collect().head
    assert(checks.getBoolean(0) && checks.getBoolean(1) && checks.getBoolean(2))

    // dedup: no duplicate fingerprints survive
    val fpDupes = ts.groupBy(T.fingerprintMd5($"text")).count()
      .filter($"count" > 1).count()
    assert(fpDupes == 0)

    // mixture: only budgeted sources, budgets respected
    val bySrc = ts.groupBy("source").agg(sum(T.tokenCount($"text")).as("t"))
      .as[(String, Long)].collect().toMap
    assert(bySrc.keySet.subsetOf(budgets.keySet))
    bySrc.foreach { case (s, t) => assert(t <= budgets(s), s"$s over budget: $t") }

    // split: every row labeled, labels from the declared set
    val splits = ts.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(ts.filter($"split".isNull).count() == 0)
    assert(ts.count() > 0)

    // determinism: a second full run produces the identical table
    runAll(s"$work/b")
    val ts2 = new ParquetTable(spark, s"$work/b/training_set").read()
    assert(ts.exceptAll(ts2).count() == 0 && ts2.exceptAll(ts).count() == 0)

    // the registry path (string params, budgets as "src:count,...")
    // resolves and produces the same table
    graft.orchestration.JobRegistry.registerBuiltins()
    val viaRegistry = graft.orchestration.JobRegistry
      .get("build_training_set").get(Map(
        "docs_path" -> s"$sf001/documents.parquet",
        "out_root" -> s"$work/c",
        "budgets" -> "src0:400,src1:300,src2:250"))
    val r = TaskGraph.run(viaRegistry, spark)
    assert(r.succeeded, r.states)
    val ts3 = new ParquetTable(spark, s"$work/c/training_set").read()
    assert(ts.exceptAll(ts3).count() == 0 && ts3.exceptAll(ts).count() == 0)
  }

  test("classifierTrainPath chains the learned filter between heuristics and dedup") {
    val work = Files.createTempDirectory("corpus-clf").toString
    // labeled training frame: the latent rule is presence of 'spamword'
    val labeled = ((1 to 30).map(i =>
        (s"good clean document number $i with many plain words " +
          "the a of and to in data table query", 1.0)) ++
      (1 to 30).map(i =>
        (s"spamword offer $i spamword click spamword free " +
          "the a of and to in data table query", 0.0)))
      .toDF("text", "y")
    labeled.write.mode("overwrite").parquet(s"$work/labels")
    // corpus: sf0.01 docs plus planted spammy docs that pass the
    // heuristic filters (long enough, English-looking)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val planted = (1 to 5).map(i => (900000L + i,
      "spamword offer spamword click spamword free spamword buy " +
        "the a of and to in data table query row scan fast slow merge",
      "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).write.mode("overwrite")
      .parquet(s"$work/docs")
    val r = TaskGraph.run(CorpusJobs.buildTrainingSet(
      s"$work/docs", s"$work/out",
      budgets = Map("src0" -> 400L, "src1" -> 300L),
      classifierTrainPath = Some(s"$work/labels")), spark)
    assert(r.succeeded, r.states)
    val filtered = new ParquetTable(spark, s"$work/out/learned_filtered")
      .read().cache()
    // every planted spam doc is gone; the bulk of real docs survive
    assert(filtered.filter($"doc_id" >= 900000L).count() == 0,
      "planted spam survived the learned filter")
    val cleaned = new ParquetTable(spark, s"$work/out/cleaned").read()
    assert(filtered.count() >= cleaned.count() / 2,
      "learned filter dropped most of the real corpus")
    // downstream stages consumed the filtered table
    val ts = new ParquetTable(spark, s"$work/out/training_set").read()
    assert(ts.filter($"doc_id" >= 900000L).count() == 0)
    assert(ts.count() > 0)
  }

  test("evalDocsPath chains decontamination: the quoting doc drops, others survive") {
    val work = Files.createTempDirectory("corpusd").toString
    val passage = ("the quick brown fox jumps over the lazy dog and then " +
      "it runs far away into the deep dark forest tonight")
    val clean = "a completely unrelated document about trains and stations " +
      "that keeps going with many ordinary english words in it for a while"
    // doc 1 quotes the eval passage verbatim inside a longer page
    val docs = Seq(
      (1L, s"some page header text here $passage and some footer text", "src0"),
      (2L, clean, "src0"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$work/docs")
    Seq((100L, passage)).toDF("doc_id", "text")
      .write.parquet(s"$work/eval")
    def build(out: String, eval: Option[String]): Set[Long] = {
      val r = TaskGraph.run(CorpusJobs.buildTrainingSet(
        s"$work/docs", out, minQuality = 0.0, minTokens = 5,
        budgets = Map("src0" -> 10000L), evalDocsPath = eval), spark)
      assert(r.succeeded, r.states)
      new ParquetTable(spark, s"$out/training_set").read()
        .select("doc_id").as[Long].collect().toSet
    }
    assert(build(s"$work/no_eval", None) == Set(1L, 2L))
    assert(build(s"$work/with_eval", Some(s"$work/eval")) == Set(2L))
    // the registry path accepts the optional param
    graft.orchestration.JobRegistry.registerBuiltins()
    val viaRegistry = graft.orchestration.JobRegistry
      .get("build_training_set").get(Map(
        "docs_path" -> s"$work/docs", "out_root" -> s"$work/reg",
        "budgets" -> "src0:10000", "eval_docs_path" -> s"$work/eval"))
    val r = TaskGraph.run(viaRegistry, spark)
    assert(r.succeeded, r.states)
    assert(new ParquetTable(spark, s"$work/reg/training_set").read()
      .select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("qualityCanonical keeps the best member of each near-dup cluster") {
    val work = Files.createTempDirectory("corpusq").toString
    // two near-dup English docs (≥10 tokens, well over trigram-Jaccard
    // 0.5): the higher-id copy carries more stopword/length mass, so it
    // outscores the lower id the min-id rule would keep
    val base = "the cat sat on the mat and it was warm in the sun today"
    val docs = Seq(
      (1L, base, "src0"),
      (2L, base + " and that is the end of it all for now", "src0"),
      (50L, "the dog ran far away over the hills and it kept running for a while", "src0"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$work/docs")
    def survivors(out: String, best: Boolean): Set[Long] = {
      val r = TaskGraph.run(CorpusJobs.buildTrainingSet(
        s"$work/docs", out, minQuality = 0.0, minTokens = 5,
        budgets = Map("src0" -> 10000L), qualityCanonical = best), spark)
      assert(r.succeeded, r.states)
      new ParquetTable(spark, s"$out/training_set").read()
        .select("doc_id").as[Long].collect().toSet
    }
    val qualityPick = survivors(s"$work/q", best = true)
    val minIdPick = survivors(s"$work/m", best = false)
    assert(minIdPick.contains(1L) && !minIdPick.contains(2L))
    assert(qualityPick.contains(2L) && !qualityPick.contains(1L))
    assert(qualityPick.contains(50L) && minIdPick.contains(50L))
  }
}

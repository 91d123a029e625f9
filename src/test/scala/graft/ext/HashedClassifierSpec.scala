package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HashedClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 1 << 12

  private def toy = Seq(
    // class 1: "good"-heavy docs; class 0: "spam"-heavy
    (1.0, "good clean prose with good structure and good flow"),
    (1.0, "good words good sentences good paragraphs here"),
    (1.0, "a good document has good grammar and good style"),
    (0.0, "spam spam buy now spam click spam here spam"),
    (0.0, "spam offer spam free spam winner spam prize"),
    (0.0, "click spam buy spam now spam free spam"),
  ).toDF("y", "text")

  test("separable toy corpus trains to perfect accuracy") {
    val m = HashedClassifier.fit(toy, "text", "y", dim = dim, iters = 30)
    val scored = HashedClassifier.predict(toy, "text", m)
    assert(scored.filter(col("pred") === col("y").cast("int")).count() === 6)
  }

  test("training is deterministic: two fits produce identical weights") {
    val a = HashedClassifier.fit(toy, "text", "y", dim = dim, iters = 5)
    val b = HashedClassifier.fit(toy, "text", "y", dim = dim, iters = 5)
    assert(a.w.sameElements(b.w))
  }

  test("training reduces log-loss monotonically over rounds") {
    def logLoss(iters: Int): Double = {
      val m = HashedClassifier.fit(toy, "text", "y", dim = dim, iters = iters)
      toy.select(
        avg(-(col("y") * log(HashedClassifier.probability(
            HashedClassifier.features(col("text"), dim), m)) +
          (lit(1.0) - col("y")) * log(lit(1.0) -
            HashedClassifier.probability(
              HashedClassifier.features(col("text"), dim), m)))))
        .as[Double].head()
    }
    val losses = Seq(1, 5, 15).map(logLoss)
    assert(losses(1) < losses(0) && losses(2) < losses(1),
      s"loss not decreasing: $losses")
  }

  test("a relative-frequency rule is learned: held-out AUC is high") {
    // label = rel freq of 'data' ≥ 3% — mean-pooling puts the rule in
    // the hypothesis class, so the trained scorer must RANK held-out
    // docs by it (the production filter contract: keep top-X% by
    // score). Chance AUC is 0.5.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val labeled = docs.withColumn("y",
      (size(filter(split(lower(col("text")), "\\s+"), t => t === "data"))
        / size(split(lower(col("text")), "\\s+")) >= 0.03).cast("double"))
    val folds = labeled.withColumn("part", pmod(col("doc_id"), lit(5)))
    val train = folds.filter(col("part") < 4)
    val test0 = folds.filter(col("part") === 4)
    val m = HashedClassifier.fit(train, "text", "y", dim = dim, iters = 25)
    val scored = HashedClassifier.predict(test0, "text", m)
    val auc = HashedClassifier.auc(scored, "y", "prob", Seq("doc_id"))
    assert(auc >= 0.9, s"held-out AUC $auc below 0.9")
  }

  test("auc matches a hand-computed value, and is 1.0 on perfect ranking") {
    val scored = Seq(
      (1L, 0.9, 1.0), (2L, 0.8, 1.0), (3L, 0.7, 0.0),
      (4L, 0.6, 1.0), (5L, 0.5, 0.0), (6L, 0.4, 0.0),
    ).toDF("doc_id", "prob", "y")
    // positives at ranks 6,5,3 (ascending prob) → (14 − 6)/(3·3)
    val a = HashedClassifier.auc(scored, "y", "prob", Seq("doc_id"))
    assert(math.abs(a - 8.0 / 9.0) < 1e-12)
    val perfect = Seq((1L, 0.9, 1.0), (2L, 0.8, 1.0), (3L, 0.2, 0.0),
      (4L, 0.1, 0.0)).toDF("doc_id", "prob", "y")
    assert(HashedClassifier.auc(perfect, "y", "prob", Seq("doc_id")) === 1.0)
  }


  test("gradient rows are bounded by dim (driver-collect contract)") {
    // every feature id is pmod(hash, dim) — assert the range directly
    val f = toy.select(explode(
      HashedClassifier.features(col("text"), dim)).as("feat"))
    val bounds = f.agg(min("feat"), max("feat")).head()
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) < dim)
  }

  test("native featurize kernel == HOF twin on real docs and adversarial strings") {
    val real = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("text"))
    val nasty = Seq(
      "",                              // empty
      "   \t\n\f\r  ",           // whitespace soup, every \s char
      "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΎΣ word",         // Greek final-sigma lowercasing
      "Tab\tsplit\nandmore\fhere\rnow",
      "trailingΣ",                     // sigma at end of text
      "mixedCASE tokens WITH  double  spaces ",
      "ümläut ÉCOLE İstanbul",         // non-ASCII lowercase mappings
    ).toDF("text")
    for (df <- Seq(real, nasty)) {
      val rows = df.select(
          HashedClassifier.features(col("text"), dim).as("native"),
          HashedClassifier.featuresHof(col("text"), dim).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"featurize diverged: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}")
      }
    }
  }

  test("native score kernel == HOF twin bit-for-bit; trained model included") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val m = HashedClassifier.fit(
      docs.withColumn("y", (pmod(col("doc_id"), lit(2)) === 0).cast("double")),
      "text", "y", dim = dim, iters = 5)
    val f = HashedClassifier.features(col("text"), dim)
    val pairs = docs.select(
        HashedClassifier.score(f, m).as("native"),
        HashedClassifier.scoreHof(f, m).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"kernel diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native score kernel stays inside whole-stage codegen (no fallback)") {
    val m = HashedClassifier.TextModel(dim, new Array[Double](dim + 1))
    val scored = spark.read.parquet(s"$sf001/documents.parquet")
      .select(HashedClassifier.score(
        HashedClassifier.features(col("text"), dim), m).as("s"))
    val p = scored.queryExecution.executedPlan.toString
    // "*(n) Project" is the whole-stage-codegen marker in the simple
    // plan string (the literal node name only prints in formatted mode)
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection left whole-stage codegen:\n$p")
    assert(p.contains("graft_hashed_score") && p.contains("graft_hashed_grams"),
      s"native kernels missing:\n$p")
    // the HOF twin's per-gram fold shows up as an aggregate() lambda;
    // the native path must not contain one (featurize's tokenize
    // transform/filter lambdas are separate and expected)
    assert(!p.contains("aggregate("),
      s"score still folds through the lambda interpreter:\n$p")
  }

  test("scoring is a pure scan-stage projection (no shuffle; the 100 TB filter path)") {
    val m = HashedClassifier.TextModel(dim, new Array[Double](dim + 1))
    val p = HashedClassifier.predict(
        spark.read.parquet(s"$sf001/documents.parquet"), "text", m)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"predict gained a shuffle:\n$p")
  }

  test("empty and single-token docs featurize without error") {
    val edge = Seq((1.0, ""), (0.0, "word"), (1.0, "  ")).toDF("y", "text")
    val m = HashedClassifier.TextModel(dim, new Array[Double](dim + 1))
    val out = HashedClassifier.predict(edge, "text", m).collect()
    assert(out.length === 3)
    // zero weights → σ(0) = 0.5 for every doc, including empty ones
    assert(out.forall(_.getAs[Double]("prob") === 0.5))
  }
}

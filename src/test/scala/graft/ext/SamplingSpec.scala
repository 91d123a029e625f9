package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashUniform is deterministic, in [0,1), and salt-decorrelated") {
    val df = (1L to 2000L).toDF("id")
    val u = df.select(Sampling.hashUniform($"id", "a").as("u"))
      .as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    val u2 = df.select(Sampling.hashUniform($"id", "a").as("u"))
      .as[Double].collect()
    assert(u.toSeq == u2.toSeq) // bit-identical across evaluations
    // roughly uniform: each decile within a loose band
    val deciles = u.groupBy(x => (x * 10).toInt).view.mapValues(_.length)
    assert(deciles.values.forall(n => n > 120 && n < 280), deciles.toMap)
    // different salt → different draw (decorrelated selections)
    val ub = df.select(Sampling.hashUniform($"id", "b").as("u"))
      .as[Double].collect()
    val sameHalf = u.zip(ub).count { case (x, y) => (x < 0.5) == (y < 0.5) }
    assert(math.abs(sameHalf - 1000) < 150, s"salts correlated: $sameHalf/2000")
  }

  test("sample decisions are stable under corpus growth (no reshuffle flips)") {
    val small = (1L to 500L).toDF("id")
    val big = (1L to 5000L).toDF("id")
    val inSmall = Sampling.sample(small, "id", 0.25, "g").as[Long].collect().toSet
    val inBig = Sampling.sample(big, "id", 0.25, "g").as[Long].collect().toSet
    assert(inBig.filter(_ <= 500L) == inSmall) // membership is per-key, not per-run
    val splitSmall = Sampling.assignSplit(small, "id",
      Seq(("train", 0.75), ("val", 0.25)), "sp")
      .select("id", "split").as[(Long, String)].collect().toMap
    val splitBig = Sampling.assignSplit(big, "id",
      Seq(("train", 0.75), ("val", 0.25)), "sp")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(splitSmall.forall { case (k, v) => splitBig(k) == v })
  }

  test("sampling by join key preserves referential integrity across tables") {
    val orders = Tables.orders(spark, sf0001).select($"o_custkey".as("k")).distinct()
    val customer = Tables.customer(spark, sf0001).select($"c_custkey".as("k"))
    val oKeys = Sampling.sample(orders, "k", 0.3, "ri").as[Long].collect().toSet
    val cKeys = Sampling.sample(customer, "k", 0.3, "ri").as[Long].collect().toSet
    // every sampled order's customer is in the sampled customer set
    assert(oKeys.subsetOf(cKeys) || oKeys.forall(cKeys.contains))
  }

  test("stratifiedSample hits per-stratum fractions; absent strata dropped at default 0") {
    val df = Tables.documents(spark, sf001)
    val out = Sampling.stratifiedSample(df, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultFraction = 0.0)
    val bySrc = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.keySet == Set("src0")) // src1 at 0, others defaulted to 0
    assert(bySrc("src0") == df.filter($"source" === "src0").count())
  }

  test("tokenBudgetMixture: budgets respected, deterministic, monotone in budget") {
    val df = Tables.documents(spark, sf001)
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    def totalTokens(budget: Long) = Sampling.tokenBudgetMixture(
        df, "source", "doc_id", toks, Map("src0" -> budget, "src1" -> budget))
      .groupBy("source").agg(sum(toks).as("t"))
      .as[(String, Long)].collect().toMap
    val t500 = totalTokens(500L)
    assert(t500.keySet == Set("src0", "src1"))
    assert(t500.values.forall(_ <= 500L))
    val t900 = totalTokens(900L)
    assert(t900.values.forall(_ <= 900L))
    assert(t900("src0") >= t500("src0") && t900("src1") >= t500("src1"))
    // larger budget strictly extends the same prefix (no re-ordering)
    val d500 = Sampling.tokenBudgetMixture(df, "source", "doc_id", toks,
      Map("src0" -> 500L)).select("doc_id").as[Long].collect().toSet
    val d900 = Sampling.tokenBudgetMixture(df, "source", "doc_id", toks,
      Map("src0" -> 900L)).select("doc_id").as[Long].collect().toSet
    assert(d500.subsetOf(d900))
  }

  test("temperatureMixture: sqrt budgets, small-stratum upweighting, whole-stratum cap") {
    // two strata, 9:1 token ratio — α=0.5 gives the small one a
    // 1/(3+1)=25% share instead of the proportional 10%
    val df = ((1L to 90L).map(i => (i, "big", "w " * 10)) ++
      (91L to 100L).map(i => (i, "small", "w " * 10)))
      .toDF("doc_id", "stratum", "text")
    val toks = graft.functions.TextFunctions.tokenCount(col("text"))
    val out = Sampling.temperatureMixture(df, "stratum", "doc_id", toks,
      totalTokens = 400L, salt = "t")
    val got = out.groupBy("stratum").agg(sum(toks).as("t"))
      .as[(String, Long)].collect().toMap
    // budgets: big = ⌊400·√900/(√900+√100)⌋ = 300, small = ⌊400·√100/40⌋ = 100
    assert(got("big") == 300L, got.toString)
    // small stratum only HAS 100 tokens and budget is 100 → kept whole
    assert(got("small") == 100L)
    // equals tokenBudgetMixture with the hand-computed budgets
    val manual = Sampling.tokenBudgetMixture(df, "stratum", "doc_id", toks,
        Map("big" -> 300L, "small" -> 100L), salt = "t")
      .select("doc_id").as[Long].collect().toSet
    val auto = out.select("doc_id").as[Long].collect().toSet
    assert(auto == manual)
    // α=1 (pow path) is proportional: big 360, small 40
    val prop = Sampling.temperatureMixture(df, "stratum", "doc_id", toks,
        totalTokens = 400L, alpha = 1.0, salt = "t")
      .groupBy("stratum").agg(sum(toks).as("t"))
      .as[(String, Long)].collect().toMap
    assert(prop("big") == 360L, prop.toString)
    assert(prop("small") == 40L)
  }

  test("weightedSample: inclusion proportional to weight, deterministic, partition-stable") {
    // weights 1..1000, ΣW = 500500; expected 200 rows ⇒ p(w) = 200·w/ΣW
    val df = (1L to 1000L).map(i => i -> i).toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, "id", col("w"), expectedRows = 200, salt = "t")
        .select("id").as[Long].collect().toSet
    val picked = run(df)
    assert(run(df.repartition(13)) == picked)
    // expected size: deterministic measurement, generous band
    assert(picked.size > 120 && picked.size < 300, s"size ${picked.size}")
    // heavier rows picked more often: top-decile rate ≥ 4× bottom-decile
    val loRate = picked.count(_ <= 100).toDouble / 100
    val hiRate = picked.count(_ > 900).toDouble / 100
    assert(hiRate >= 4 * math.max(loRate, 0.01) || loRate == 0.0,
      s"lo $loRate hi $hiRate")
    // certainty region: p ≥ 1 ⇔ w ≥ ΣW/k = 2502.5 — none here; but zero
    // and negative weights are never selected
    val withZero = ((1L to 10L).map(i => i -> 0L) ++ Seq(11L -> -5L)).toDF("id", "w")
    assert(Sampling.weightedSample(withZero, "id", col("w"), 5, "t").count() == 0)
  }

  test("sampleKPerGroup: exact size per stratum, deterministic, small strata kept whole") {
    val df = ((1L to 100L).map(i => i -> "big") ++ (101L to 105L).map(i => i -> "tiny"))
      .toDF("id", "grp")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.sampleKPerGroup(d, "grp", "id", 10, salt = "t")
        .select("id", "grp").as[(Long, String)].collect().toSet
    val out = run(df)
    assert(out.count(_._2 == "big") == 10)
    assert(out.count(_._2 == "tiny") == 5) // stratum smaller than k → all rows
    assert(run(df.repartition(9)) == out)
    assert(Sampling.sampleKPerGroup(df, "grp", "id", 0, "t").count() == 0)
  }

  test("weightedSample: rows past the certainty threshold are always kept") {
    // one huge weight dominating ΣW: k·w/ΣW > 1 ⇒ always in the sample
    val df = ((1L to 50L).map(i => i -> 1L) ++ Seq(99L -> 10000L)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", col("w"), 3, "t")
      .select("id").as[Long].collect().toSet
    assert(picked.contains(99L))
  }
}

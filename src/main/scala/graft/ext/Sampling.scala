package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset construction for training-data pipelines:
  * hash-based sampling, split assignment, and token-budget mixtures.
  *
  * Everything here derives randomness from `md5(key ‖ salt)` instead of
  * an RNG: the decision for a given row is a pure function of its key,
  * so results are (a) reproducible across runs, cluster topologies and
  * engines (md5 arithmetic ports to any SQL dialect — the DuckDB
  * oracles reproduce these queries bit-for-bit), (b) stable under
  * re-partitioning and retries (a row never flips in or out of the
  * sample when a task is re-executed — `rand()` cannot promise that),
  * and (c) consistent across tables: sampling two tables by the same
  * join key keeps referential integrity, the property `TABLESAMPLE`
  * lacks.
  *
  * The uniform variate is the first 15 hex digits of the md5 as a
  * 60-bit integer over 16¹⁵ — enough resolution that per-mille
  * fractions are exact to ~10⁻¹⁸.
  */
object Sampling {

  private val Denom = 1152921504606846976.0 // 16^15 = 2^60, exact double

  /** Deterministic uniform in [0, 1) from a key column (+ salt).
    * Different salts give independent draws from the same key — use a
    * distinct salt per decision (sample vs split vs mixture order) so
    * decisions don't correlate.
    */
  def hashUniform(key: Column, salt: String = ""): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("double") / lit(Denom))

  /** Keep each row with probability `fraction`, deterministically by
    * key. Scale: a pure per-row filter — pushes into the scan stage,
    * no shuffle, no RNG state.
    */
  def sample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(hashUniform(col(keyCol), salt) < fraction)
  }

  /** Per-stratum sampling fractions (the mixture knob: "3% of web, 30%
    * of books, all of wiki"). Strata absent from the map get
    * `defaultFraction` (0 = dropped).
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultFraction)) {
      case (acc, (s, f)) => when(col(stratumCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(keyCol), salt) < frac)
  }

  /** Disjoint split assignment (train/val/test) by cumulative ranges of
    * the hash variate: `splits` are (label, weight) with weights summing
    * to ≤ 1; rows falling past the last range get null (dropped by a
    * downstream filter if undesired). A row's split never changes when
    * other rows are added — the property random shuffles lack.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split weights must sum to <= 1")
    val u = hashUniform(col(keyCol), salt)
    val (expr0, _) = splits.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, lo), (label, wt)) =>
        (when(u >= lo && u < lo + wt, lit(label)).otherwise(acc), lo + wt)
    }
    df.withColumn("split", expr0)
  }

  /** EXACTLY-k-per-stratum sample: rank each stratum's rows by the
    * hash variate (ties → key) and keep the first k — fixed-size
    * per-group samples (eval slices, inspection sets, per-source
    * probes) where Bernoulli's ±√k size jitter is unacceptable.
    * Deterministic for a given corpus; unlike [[sample]], RANK-based
    * membership can shift when rows are added to a stratum (a new row
    * hashing into the top k displaces the old k-th) — growth-stable
    * selection needs the Bernoulli variants.
    *
    * Scale: one shuffle on the stratum key; per-group state is a
    * top-k heap's worth of rows at the window, skew bounded by the
    * largest stratum.
    */
  def sampleKPerGroup(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(keyCol), salt), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted Bernoulli sample targeting `expectedRows` rows: each row
    * is kept with probability min(1, expectedRows · w / ΣW) — inclusion
    * probability proportional to `weight` (Poisson/probability-
    * proportional-to-size sampling), decided deterministically by the
    * row's hash variate. The classic use: sample a corpus proportional
    * to token count or quality score so the expected TOKEN volume, not
    * document count, is controlled.
    *
    * Exactly reproducible across engines: the variate is the md5
    * construction above and the threshold uses only IEEE +,·,/ — both
    * sides of the oracle compute bit-identical doubles, so the sampled
    * row SET (not just its size) is pinned.
    *
    * Scale shape: one tiny total-weight aggregate broadcast back, then
    * a pure scan-stage filter — no shuffle of the data itself, and the
    * decision survives re-partitioning and retries. Rows with
    * non-positive weight are never selected.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      expectedRows: Long,
      salt: String = ""): DataFrame = {
    require(expectedRows >= 0, "expectedRows must be non-negative")
    val total = df.agg(sum(weight).cast("double").as("__w_total"))
    df.crossJoin(broadcast(total))
      .filter(weight > 0 &&
        hashUniform(col(keyCol), salt) * col("__w_total") <
          lit(expectedRows.toDouble) * weight)
      .drop("__w_total")
  }

  /** Token-budget mixture: per stratum, keep documents in deterministic
    * hash order until the cumulative token count reaches the stratum's
    * budget (docs whose cumulative sum is ≤ budget survive) — "build a
    * 1T-token mix: 600B web, 300B code, 100B books" as one declarative
    * pass. Strata absent from `budgets` are dropped.
    *
    * Scale notes: the running sum is a window per stratum — one shuffle
    * on the stratum key, and each stratum's cumsum is a single ordered
    * task. With few huge strata (the usual mixture shape: tens of
    * sources × TBs), first cut each stratum to ~budget with
    * [[stratifiedSample]] at fraction ≈ budget/stratum_tokens (a
    * shuffle-free 99% volume reduction), then run the exact budget trim
    * on the residue.
    */
  def tokenBudgetMixture(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokens: Column,
      budgets: Map[String, Long],
      salt: String = ""): DataFrame = {
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(keyCol), salt), col(keyCol))
    df.withColumn("__cum", sum(tokens).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Temperature-scaled mixture (the XLM-R / multilingual-LM rebalance:
    * sample stratum s in proportion to n_s^α, α<1 upweighting small
    * strata): per-stratum budgets are COMPUTED from corpus totals —
    * budget_s = ⌊total · n_s^α / Σ n^α⌋ — then the exact md5-ordered
    * token trim of [[tokenBudgetMixture]] applies them. One bounded
    * aggregate (one row per stratum) decides the budgets; everything
    * else is the q52 shape, so the 100 TB cost profile is unchanged.
    *
    * Cross-engine exactness (the default α = 0.5): sqrt is IEEE
    * correctly-rounded in every engine (pow is NOT — which is why 0.5
    * is the proven default), the normalizer Z is a LEFT-TO-RIGHT fold
    * over strata in stratum-name order (an engine-replayable ordered
    * sum — a DuckDB running-window sum computes the identical value),
    * and each budget is one multiply of one divide: floor-identical
    * bits on both sides. Other α values compute via pow and carry no
    * cross-engine bit guarantee (document or oracle with a tolerance).
    *
    * A stratum's budget may exceed its own token count (α<1 upweights
    * small strata); the trim then keeps the whole stratum — the
    * standard behavior (upsampling/repetition is a separate policy).
    */
  def temperatureMixture(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokens: Column,
      totalTokens: Long,
      alpha: Double = 0.5,
      salt: String = ""): DataFrame = {
    val totals = df.groupBy(col(stratumCol))
      .agg(sum(tokens).cast("long").as("t"))
      .collect() // bounded: one row per stratum (tens of sources)
      .map(r => (r.getString(0), r.getLong(1)))
      // code-point order (== UTF-8 byte order), NOT Scala's default
      // String order (UTF-16 code units): supplementary-plane stratum
      // names would otherwise fold in a different order than the
      // DuckDB oracle's ORDER BY, breaking the bit-identical-Z claim
      .sortWith { case ((a, _), (b, _)) =>
        java.util.Arrays.compare(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      }
    val pw: Double => Double =
      if (alpha == 0.5) math.sqrt else x => math.pow(x, alpha)
    val z = totals.foldLeft(0.0) { case (acc, (_, t)) => acc + pw(t.toDouble) }
    val budgets = totals.map { case (s, t) =>
      s -> math.floor(totalTokens.toDouble * (pw(t.toDouble) / z)).toLong
    }.toMap
    tokenBudgetMixture(df, stratumCol, keyCol, tokens, budgets, salt)
  }
}

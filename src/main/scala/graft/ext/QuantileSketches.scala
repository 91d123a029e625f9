package graft.ext

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.plans.{KllMergeAgg, KllSketchAgg}

/** Mergeable QUANTILE rollups over KLL sketches — the percentile twin
  * of the HLL distinct-count tier ([[Sketches]]) and the theta
  * set-operation tier ([[ThetaSketches]]).
  *
  * The 100 TB pattern: percentiles, like distinct counts, do not
  * decompose — you cannot combine per-day p95s into a month p95, so
  * without a mergeable sketch every latency/size/score percentile
  * rollup repays a full scan (or an `approx_percentile` re-aggregation
  * of raw values). Persist a few-KB KLL sketch per fine-grained group
  * ONCE; any coarser rollup merges stored sketches losslessly and
  * reads kilobytes. Both steps are ordinary hash aggregates with
  * map-side partials ([[graft.plans.KllSketchAgg]] /
  * [[graft.plans.KllMergeAgg]]).
  *
  * Error contract (what q130 gates): for any rank r, the true
  * normalized rank of the sketch's quantile estimate is within the
  * sketch's own `getNormalizedRankError` ε of r (99 % confidence per
  * Karnin-Lang-Liberty; the gate allows 2ε so the probabilistic tail
  * cannot flake a green tree). KLL compaction is randomized, so
  * ESTIMATES are run-dependent — only the bound is stable, which is
  * why the oracle is the zero-row invariant form, never value
  * equality (NUMERICS rule 3 applies to `approx_percentile` for the
  * same reason).
  *
  * Scalar readers run as UDFs on ALREADY-AGGREGATED rows (one per
  * group — bounded by grouping cardinality, never data volume), the
  * same deliberate choice as [[ThetaSketches]].
  */
object QuantileSketches {

  /** Per-group KLL sketch over a numeric column. `k` = 200 gives
    * ε ≈ 1.65 % normalized rank error at 99 % confidence, ~1-3 KB
    * serialized per group.
    */
  def sketchAgg(value: Column, k: Int = 200): Column =
    bridge.column(KllSketchAgg(bridge.expression(value), k)
      .toAggregateExpression())

  /** Merge stored sketches (binary column) — the rollup aggregate. */
  def mergeAgg(sketch: Column, k: Int = 200): Column =
    bridge.column(KllMergeAgg(bridge.expression(sketch), k)
      .toAggregateExpression())

  private def heap(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  /** Quantile estimate of a stored sketch at normalized rank `r`
    * (inclusive search criterion — rank counts items ≤ q).
    */
  val quantileAt: UserDefinedFunction =
    udf((b: Array[Byte], r: Double) => heap(b).getQuantile(r))

  /** The sketch's own single-query normalized-rank-error bound ε. */
  val rankError: UserDefinedFunction =
    udf((b: Array[Byte]) => heap(b).getNormalizedRankError(false))

  /** The stored-sketch artifact: `keys` + `sketch` (binary). */
  def sketchTable(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int = 200): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sketchAgg(col(valueCol).cast("double"), k).as("sketch"))

  /** Roll stored sketches up to `groupKeys` and read quantile
    * estimates at each rank in `ranks`: one merged-sketch row per
    * group fans out to (group, target_rank, est_q, eps) rows.
    */
  def rollupQuantiles(sketches: DataFrame, groupKeys: Seq[String],
      ranks: Seq[Double], k: Int = 200): DataFrame =
    sketches.groupBy(groupKeys.map(col): _*)
      .agg(mergeAgg(col("sketch"), k).as("__m"))
      .select(groupKeys.map(col) :+
        explode(array(ranks.map(lit): _*)).as("target_rank") :+
        col("__m"): _*)
      .withColumn("est_q", quantileAt(col("__m"), col("target_rank")))
      .withColumn("eps", rankError(col("__m")))
      .drop("__m")

  /** q130's invariant frame: rows where the target rank escapes the
    * TRUE rank band of its merged-rollup quantile estimate widened by
    * 2ε — i.e. target ∉ [rank_excl(est) − 2ε, rank_incl(est) + 2ε],
    * with rank_excl = P(v < est) and rank_incl = P(v ≤ est). The
    * two-sided band is ATOM-SAFE: a heavy repeated value legitimately
    * spans a wide inclusive-rank interval, and any target inside that
    * interval is a correct answer — a naive |rank_incl − target| gate
    * would flag every discrete atom (pinned in the spec). The exact
    * leg joins the (groups × ranks)-row estimate table back to the
    * raw values — broadcast, one scan. Empty = the merge-then-query
    * contract holds corpus-wide.
    */
  def rollupViolations(df: DataFrame, fineKeys: Seq[String],
      coarseKeys: Seq[String], valueCol: String, ranks: Seq[Double],
      k: Int = 200): DataFrame = {
    val est = rollupQuantiles(sketchTable(df, fineKeys, valueCol, k),
      coarseKeys, ranks, k)
    violationsVs(df, est, coarseKeys, valueCol)
  }

  /** The exact-leg gate of [[rollupViolations]], factored so a spec
    * can inject a deliberately wrong estimate table and prove the
    * filter fires. `est` needs (coarseKeys, target_rank, est_q, eps).
    */
  def violationsVs(df: DataFrame, est: DataFrame,
      coarseKeys: Seq[String], valueCol: String): DataFrame = {
    val raw = df.filter(col(valueCol).isNotNull)
      .select(coarseKeys.map(col) :+ col(valueCol).cast("double")
        .as("__v"): _*)
    raw.join(broadcast(est), coarseKeys)
      .groupBy((coarseKeys ++ Seq("target_rank", "est_q", "eps"))
        .map(col): _*)
      .agg((sum(when(col("__v") < col("est_q"), 1L).otherwise(0L)) /
        count(lit(1))).as("rank_lo"),
        (sum(when(col("__v") <= col("est_q"), 1L).otherwise(0L)) /
          count(lit(1))).as("rank_hi"))
      .filter(col("target_rank") < col("rank_lo") - lit(2.0) * col("eps") ||
        col("target_rank") > col("rank_hi") + lit(2.0) * col("eps"))
      .select(coarseKeys.map(col) :+ col("target_rank") :+ col("est_q") :+
        col("rank_lo") :+ col("rank_hi") :+ col("eps"): _*)
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact market-basket association statistics (Agrawal & Srikant's
  * support/confidence frame plus lift) over the same group–item
  * projection [[Triangles.coOccurrenceEdges]] uses — the co-occurrence
  * analytics a corpus pipeline runs over (domain, token-class),
  * (source, near-dup-cluster) or classic (order, part) baskets.
  *
  * Everything is integer/fixed-point: counts are longs, ratios are
  * ×10⁶ truncating divisions (`support_e6`, `conf_a_b_e6`,
  * `lift_e6`), so results are bit-identical on any partitioning and
  * replay EXACTLY in the oracle's integer division. lift > 10⁶ means
  * positive association (observed co-occurrence above the
  * independence expectation).
  *
  * Scale shape: one distinct + self-equi-join on the basket key for
  * pairs (quadratic only within a basket), one hash agg per side for
  * item frequencies, one broadcastable single-row frame for the basket
  * census. The `minCooc` floor bounds output and prunes the long tail
  * BEFORE the degree joins. Overflow: lift's numerator
  * cooc·n_baskets·10⁶ is computed in decimal(38,0) (38 digits of
  * headroom — past any physical basket census), then integer-divided
  * back to a long; the other ratios stay within int64 by
  * construction (cooc ≤ n_baskets ≤ rows).
  */
object MarketBasket {

  /** Pair rules (a, b) with a < b: `cooc` baskets containing both,
    * per-item basket counts `n_a`/`n_b`, the global basket census,
    * and the fixed-point support / confidence (both directions) /
    * lift. Pairs below `minCooc` are dropped before the joins.
    */
  def pairRules(df: DataFrame, groupCol: String, itemCol: String,
      minCooc: Long = 1L): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val baskets = g.select(col("g")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = g.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val cooc = g.as("x").join(g.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
    cooc
      .join(itemN.select(col("i").as("a"), col("n_i").as("n_a")), "a")
      .join(itemN.select(col("i").as("b"), col("n_i").as("n_b")), "b")
      .crossJoin(broadcast(baskets))
      .select(col("a"), col("b"), col("cooc"), col("n_a"), col("n_b"),
        col("n_baskets"),
        expr("(cooc * 1000000) div n_baskets").as("support_e6"),
        expr("(cooc * 1000000) div n_a").as("conf_a_b_e6"),
        expr("(cooc * 1000000) div n_b").as("conf_b_a_e6"),
        expr("cast((cast(cooc as decimal(38,0)) * n_baskets * 1000000)" +
          " div (cast(n_a as decimal(38,0)) * n_b) as bigint)").as("lift_e6"))
  }
}

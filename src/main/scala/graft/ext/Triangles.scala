package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting and global clustering coefficient — the
  * third graph primitive next to [[ConnectedComponents]] (reachability)
  * and [[PageRank]] (authority). Triangle density separates organic
  * co-occurrence structure (high transitivity) from scrape artifacts
  * and spam link farms (star-shaped, near-zero transitivity), the same
  * signal web-corpus pipelines use to down-weight template clusters.
  *
  * Algorithm: the degree-ordered node-iterator ("compact-forward",
  * Schank & Wagner 2005; Latapy 2008). Orient every undirected edge
  * from the endpoint that is SMALLER in the total order π = (degree,
  * id) toward the larger. Every triangle {u,v,w} then has exactly one
  * vertex with two out-edges (its π-minimum), so
  *
  *   triangles = |{(u→v, u→w, v→w) : π(v) < π(w)}|
  *
  * counts each triangle exactly once: wedges at u join against the
  * oriented edge set. The orientation bounds out-degree by O(√m) on
  * any graph (a vertex with out-degree d has d neighbors of degree
  * ≥ d, so d(d−1) ≤ 2m) — the wedge explosion that kills the naive
  * node-iterator on skewed degree distributions (every real
  * co-occurrence graph) cannot happen: wedge count is Σ out-deg² ≤
  * O(m^1.5) instead of Σ deg². That is the difference between a
  * hub of degree 10⁶ generating 10¹² wedges and the same hub
  * generating at most ~2m.
  *
  * Scale shape: degrees = one agg over the edge list; orientation =
  * two broadcast-or-shuffle joins against the (node, degree) table;
  * the wedge self-join and the closing edge join are plain equi-joins
  * keyed on node / (v, w) pairs — all hash-partitioned, no driver
  * state, no iteration. Everything is integer counts: bit-exact on
  * any partitioning.
  */
object Triangles {

  /** Distinct undirected co-occurrence edges `(a, b)`, a < b: item
    * pairs sharing at least one group (market-basket projection of the
    * bipartite group–item relation). The all-pairs step is quadratic
    * only WITHIN a group — bounded by the largest basket, not the
    * table — and runs as one self-equi-join on the group key.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    g.as("x").join(g.as("y"), col("x.g") === col("y.g") &&
        col("x.i") < col("y.i"))
      .select(col("x.i").as("a"), col("y.i").as("b"))
      .distinct()
  }

  /** Orient each edge from its π = (degree, id)-smaller endpoint,
    * carrying π(dst) so wedge pairs order without another degree join.
    */
  private def orient(e: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dstDeg"))
  }

  /** (n_nodes, n_edges, n_wedges, n_triangles) over an undirected
    * simple edge list `(a, b)` — callers must pre-dedup (a<b form;
    * [[coOccurrenceEdges]] does). `n_wedges` is the open+closed path-2
    * count Σ_v C(deg v, 2); global clustering coefficient =
    * 3·triangles / wedges, left to the caller so the engine output
    * stays integer-exact.
    */
  def stats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

    // orient by π = (deg, id): src is the π-smaller endpoint.
    // Materialized: it feeds THREE join legs (both wedge sides + the
    // closing edge) — without the checkpoint each leg re-runs the
    // scan + degree joins (the repo's shared-self-join-input rule).
    val oriented = orient(e, deg).localCheckpoint(eager = true)

    // wedges at the π-minimum vertex: (u→v, u→w) with π(v) < π(w)
    val wedgesAtMin = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dstDeg") < col("e2.dstDeg") ||
            (col("e1.dstDeg") === col("e2.dstDeg") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    // close the wedge with the oriented edge v→w (π(v) < π(w) already)
    val triangles = wedgesAtMin.join(oriented,
        col("v") === col("src") && col("w") === col("dst"))
      .agg(count(lit(1)).as("n_triangles"))

    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(deg * (deg - 1)) div 2")).cast("long").as("n_wedges"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(ne).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }

  /** Per-node triangle participation: (v, n_triangles). The same
    * oriented join, but each found triangle credits ALL THREE corners
    * — the per-node signal local clustering needs.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val oriented = orient(e, deg).localCheckpoint(eager = true)
    val tri = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dstDeg") < col("e2.dstDeg") ||
            (col("e1.dstDeg") === col("e2.dstDeg") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree-assortativity moments — EXACT integer sums, no division
    * (the [[MarketBasket]]/q142 discipline): over the 2m directed edge
    * ends (each undirected edge counted in both orientations, the
    * standard Newman 2002 convention), emits `m2` = 2m,
    * `s_prod` = Σ dᵤdᵥ, `s_sum` = Σ (dᵤ+dᵥ)… as the moments from which
    * r = (m2·s_prod − s_half²/…)/… assembles in any precision the
    * consumer wants. Positive assortativity (hubs link hubs) vs
    * negative (hubs link leaves) separates social-graph shapes from
    * web/biology shapes — a one-scan + two-equi-join summary.
    *
    * Column contract (all exact longs): m2 = 2m, s_prod = Σ dᵤ·dᵥ,
    * s_half = Σ (dᵤ+dᵥ)/1 over directed ends /2 … concretely r =
    * (m2·s_prod − s_half²) / (m2·s_sq − s_half²) with
    * s_half = Σ(dᵤ+dᵥ) over UNDIRECTED edges and s_sq = Σ(dᵤ²+dᵥ²)
    * likewise.
    */
  def assortativityMoments(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    withDeg.agg(
      (count(lit(1)) * 2).as("m2"),
      sum(col("da") * col("db")).as("s_prod"),
      sum(col("da") + col("db")).as("s_half"),
      sum(col("da") * col("da") + col("db") * col("db")).as("s_sq"))
  }
}

package graft.ext

import org.apache.spark.sql.Column

/** Shared centroid-assignment kernel for the k-means family
  * ([[SemDedup]], [[SimilaritySearch.ivfTopK]]).
  *
  * The centroid set rides as ONE typed literal VALUE (a single
  * `references[i]` object in generated code), NOT as per-value literal
  * SOURCE: the previous formulation expanded nCells × dim doubles into
  * the generated Java, so every Lloyd round and every run produced a
  * brand-new giant method that Janino had to recompile from scratch —
  * measured 10-40 s of driver-side compilation on q60 at sf0.1 (2 000
  * vectors!), swamping the actual arithmetic and defeating the codegen
  * cache (keyed on source text). With the value-literal form the
  * generated source is shape-constant, compiles once, and is cache-hit
  * for every subsequent assignment regardless of centroid values.
  *
  * Still scan-stage: a per-row `transform` over the (broadcast-sized)
  * centroid array — no join, no shuffle, no window; the argmin
  * arithmetic (‖c‖² − 2·v·c through the native dot product) and the
  * (d2, cell) tie order are bit-identical to the expanded form, so
  * assignments — and therefore q35/q45/q60 results — are unchanged.
  */
object CentroidAssign {

  /** `take` nearest cells of `vec` as array<struct<d2, cell>>, nearest
    * first, ties by cell id — same contract (and bit-identical
    * assignments) as the HOF form this replaces; now a native
    * primitive loop ([[graft.plans.NearestCellsExpr]]), because the
    * transform+array_sort formulation was CodegenFallback and the
    * boxed-lambda interpreter dominated every Lloyd/encode scan of
    * the ANN tier (measured: the q95/q100/q103/q114 family spends
    * most of its time here, not in arithmetic).
    */
  def nearestCells(vec: Column, centroids: Array[(Int, Seq[Double])],
      take: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.NearestCellsExpr(
      bridge.expression(vec),
      centroids.map(_._1).toIndexedSeq,
      centroids.map(_._2.toIndexedSeq).toIndexedSeq,
      take))
  }

  /** The Lloyd recipe [[SimilaritySearch.ivfTopK]] pioneered,
    * extracted for NEW cell-index call sites (existing sites keep
    * their inline copies — their init order is oracle-pinned):
    * md5-scattered seeding (deterministic), `iters` rounds of
    * assign + per-dimension mean. The SEEDING is bit-reproducible;
    * the per-round `avg()` over doubles is order-dependent, so the
    * trained centroids may differ in low-order bits across
    * partitionings — downstream consumers must gate on recall (as
    * q146/q147 do), not on centroid bytes. Bounded driver state:
    * nCells × dim doubles per round. `c` must carry (`idCol`,
    * `vdCol`: array<double>).
    */
  def trainCells(c: org.apache.spark.sql.DataFrame, nCells: Int,
      iters: Int, idCol: String = "cand_id",
      vdCol: String = "vd"): Array[(Int, Seq[Double])] = {
    import org.apache.spark.sql.functions._
    var centroids: Array[(Int, Seq[Double])] = c
      .select(col(idCol), col(vdCol))
      .orderBy(md5(col(idCol).cast("string"))).limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters) {
      val assigned = c.select(col(vdCol).as("vd"),
        element_at(nearestCells(col(vdCol), centroids, 1), 1)
          .getField("cell").as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("vd")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("d"), col("m"))))
          .as("dm"))
        .select(col("cell"), transform(col("dm"), _.getField("m")).as("v"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
      if (means.nonEmpty) centroids = means
    }
    centroids
  }
}

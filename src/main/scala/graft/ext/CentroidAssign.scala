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
}

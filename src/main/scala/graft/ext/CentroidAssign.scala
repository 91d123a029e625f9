package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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
    * first, ties by cell id — same contract as the expanded
    * `nearestCells` this replaces.
    */
  def nearestCells(vec: Column, centroids: Array[(Int, Seq[Double])],
      take: Int): Column = {
    // (‖c‖², c, cell) packed driver-side; ‖c‖² summed left-to-right
    // exactly as the expanded form did
    val packed: Seq[(Double, Seq[Double], Int)] =
      centroids.toIndexedSeq.map { case (i, v) =>
        (v.map(x => x * x).sum, v, i)
      }
    // aliases inside a higher-order-function lambda are dropped by the
    // analyzer — the positional cast names the fields instead
    val scored = transform(typedLit(packed), c =>
      struct(
        c.getField("_1") - lit(2.0) *
          VectorFunctions.dotDouble(vec, c.getField("_2")),
        c.getField("_3")))
      .cast("array<struct<d2:double,cell:int>>")
    slice(array_sort(scored), 1, take)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.VectorFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * cluster the embedding space with k-means, then search for
  * near-duplicate pairs ONLY within clusters — the O(n²/k) restriction
  * that makes embedding dedup tractable when the exact triangle join
  * ([[SimilaritySearch.cosineNearDuplicates]]) is too expensive. Every
  * candidate pair is verified with the exact cosine, so emitted pairs
  * are always a SUBSET of the exact answer; what clustering trades away
  * is recall for pairs split across cluster boundaries.
  *
  * `nAssign` soft-assigns each vector to its nAssign nearest cells
  * (pairs then need only ONE shared cell), the standard recall dial:
  * boundary pairs are the ones clustering loses, and membership in the
  * second-nearest cell catches most of them at nAssign× index cost.
  *
  * Scale shape: k-means keeps only nCells centroid rows on the driver
  * (bounded, same contract as IVF); assignment is a per-row projection
  * against broadcast centroid literals; the within-cell pair join is a
  * shuffle equi-join on cell id. Cost concentrates on the largest
  * cell — size nCells so n/nCells² pairs fit a task, and let AQE
  * skew-split hot cells; a megacluster (mode collapse in the embedding
  * space) is a data problem the nCells dial can't fix alone.
  */
object SemDedup {

  /** Near-duplicate pairs (vec_a < vec_b, cos_sim ≥ threshold) found
    * within shared k-means cells.
    */
  def pairs(
      corpus: DataFrame,
      threshold: Double,
      nCells: Int = 16,
      iters: Int = 2,
      nAssign: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    pairsManaged(corpus, threshold, nCells, iters, nAssign, idCol, vecCol)._1

  /** [[pairs]] plus a release handle for the internal normalized-corpus
    * cache (feeds every Lloyd round, the assignment, and both join
    * sides).
    */
  def pairsManaged(
      corpus: DataFrame,
      threshold: Double,
      nCells: Int = 16,
      iters: Int = 2,
      nAssign: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, () => Unit) = {
    require(nCells >= 1 && iters >= 0 && nAssign >= 1 && nAssign <= nCells)
    // normalize() yields null for null/zero-norm embeddings (padding
    // rows, failed upstream embedders); they carry no direction, pair
    // with nothing under cosine, and would NPE the centroid seed — drop
    // them here, matching the exact path's behavior (null cos_sim never
    // passes the threshold filter)
    val nv = Partitioning.forCompute(
        corpus.select(col(idCol).as("id"),
          VectorFunctions.normalize(col(vecCol)).as("nv")))
      .filter(col("nv").isNotNull)
      .cache()

    // deterministic seeding + Lloyd rounds on the UNIT vectors (spherical
    // k-means flavor: L2 argmin on normalized inputs orders by cosine)
    var centroids: Array[(Int, Seq[Double])] = nv
      .orderBy(md5(col("id").cast("string"))).limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters) {
      // DECIMAL accumulator (CentroidAssign.cellMeansDecimal): a double
      // mean depends on partial-merge order, so centroids could drift
      // by ULPs between runs and flip boundary-cell assignments — the
      // determinism claim (and q60's exactly-reproducible recall)
      // needs an order-independent sum. The dense mapper-only form
      // replaces the previous posexplode → groupBy(cell, d) decimal
      // avg with value-identical arithmetic (spec-probed equality).
      val assigned = nv.select(
        element_at(nearestCells(col("nv"), centroids, 1), 1)
          .getField("cell").as("cell"),
        col("nv").as("vd"))
      val means = CentroidAssign.cellMeansDecimal(assigned)
        .map { case (i, v) => (i, v.toSeq: Seq[Double]) }
      if (means.nonEmpty) centroids = means
    }

    val assigned = nv.select(col("id"), col("nv"),
      explode(transform(nearestCells(col("nv"), centroids, nAssign),
        _.getField("cell"))).as("cell"))
    val out = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        col("a.nv").as("nva"), col("b.nv").as("nvb"))
      // one shared cell is enough; nAssign > 1 can pair ids in several
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.dotDouble(col("nva"), col("nvb")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    (out, () => { nv.unpersist(); () })
  }

  /** Nearest `take` cells by adjusted L2 (‖c‖² − 2·v·c — same argmin,
    * native dot product), smallest first. Shared value-literal kernel —
    * see [[CentroidAssign]] for why centroids must not be expanded into
    * generated source.
    */
  private def nearestCells(vecD: Column, cents: Array[(Int, Seq[Double])],
      take: Int): Column = CentroidAssign.nearestCells(vecD, cents, take)
}

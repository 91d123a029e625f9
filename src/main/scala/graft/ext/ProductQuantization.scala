package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.VectorFunctions

/** Product quantization for embedding columns — Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search" (TPAMI
  * 2011), the standard compression path for billion-vector ANN (FAISS'
  * PQ/IVFADC family): the `dim`-dimensional space splits into `m`
  * subspaces of `dim/m` dims; each subspace gets its own k-means
  * codebook of `k` centroids; a vector encodes as `m` small codes
  * (m·log₂k bits — 64-dim float32 (256 B) → 12 B at the defaults
  * m=16, k=64, a ~21× storage cut, which is what makes a 100 TB
  * embedding corpus scannable at all; the defaults are sized for the
  * UNSTRUCTURED test embeddings, PQ's worst case — clustered real
  * corpora quantize far better at the same bit budget). Search runs
  * Asymmetric Distance Computation
  * (ADC): per query ONE m·k lookup table of exact
  * query-to-centroid distances, then each candidate costs m table
  * lookups instead of `dim` multiplies.
  *
  * Scale shape: the codebook is m·k·(dim/m) doubles — driver/broadcast
  * scale by construction, shipped into codegen as ONE typed literal
  * per kernel (the [[CentroidAssign]] value-literal rule: per-model
  * values must not become generated-source constants or every model
  * retrain recompiles the stage). Training is `iters` Lloyd rounds,
  * each one corpus scan + one (m·k·subDim)-row aggregate — all
  * subspaces in a single pass, not m passes. Encoding and the ADC
  * scan are scan-stage projections; the per-query top-k is a
  * partitioned window. Vectors are unit-normalized first, so L2 ADC
  * ranking coincides with cosine ranking (‖a−b‖² = 2−2cos on unit
  * vectors) and results are comparable with [[SimilaritySearch]]'s
  * exact leg (the q95 recall gate).
  */
object ProductQuantization {

  /** Trained codebooks: `centroids(j)(c)` is the subspace-`j` centroid
    * for code `c`, length dim/m.
    */
  case class PqModel(dim: Int, m: Int, k: Int,
      centroids: Array[Array[Array[Double]]]) {
    def subDim: Int = dim / m
  }

  private def unit(df: DataFrame, id: String, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as(id),
      VectorFunctions.normalize(col(vecCol)).as("vd"))

  /** Per-subspace code assignment for a unit vector column: argmin
    * centroid per subspace via the shared value-literal argmin kernel,
    * packed as array<int> of length m.
    */
  private def codesFor(vd: Column, model: PqModel): Column =
    array((0 until model.m).map { j =>
      val cents = model.centroids(j).zipWithIndex
        .map { case (v, c) => (c, v.toSeq) }
      element_at(
        CentroidAssign.nearestCells(
          slice(vd, lit(j * model.subDim + 1), lit(model.subDim)),
          cents, 1),
        1).getField("cell")
    }: _*)

  /** Train `m` per-subspace codebooks with `iters` Lloyd rounds.
    * Deterministic init (hash-scattered corpus vectors, the
    * [[SimilaritySearch.ivfTopK]] convention), empty cells keep their
    * previous centroid. One scan + one bounded aggregate per round,
    * covering all subspaces at once; the unit-vector projection is
    * cached (MEMORY_AND_DISK) across rounds and released on return.
    * At true corpus scale codebooks are trained on a SAMPLE (m·k
    * centroids saturate long before the full corpus informs them) —
    * pass `corpus.filter(xxhash64-fraction)` / a [[Sampling]] draw as
    * `corpus`; the gates train on the full small-SF frames so the
    * oracle has no sampling seam.
    */
  def train(corpus: DataFrame, dim: Int, m: Int = 16, k: Int = 64,
      iters: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding"): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val c = Partitioning.forCompute(unit(corpus, "id", idCol, vecCol)).cache()
    try {
      val seed = c.orderBy(md5(col("id").cast("string"))).limit(k)
        .collect().map(_.getSeq[Double](1))
      var model = PqModel(dim, m, k,
        Array.tabulate(m, k)((j, cc) =>
          seed(cc % seed.length).slice(j * subDim, (j + 1) * subDim).toArray))
      for (_ <- 1 to iters) {
        val means = c
          .select(col("vd"), posexplode(codesFor(col("vd"), model)).as(Seq("j", "code")))
          .select(col("j"), col("code"),
            posexplode(slice(col("vd"), col("j") * subDim + 1, lit(subDim)))
              .as(Seq("d", "x")))
          .groupBy(col("j"), col("code"), col("d"))
          .agg(avg(col("x")).as("mean"))
          .collect()
        val next = model.centroids.map(_.map(_.clone()))
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
        }
        model = PqModel(dim, m, k, next)
      }
      model
    } finally { c.unpersist(); () }
  }

  /** Encode the corpus: (cand_id, codes array<int> of length m). At
    * 100 TB this IS the stored index — ~21× smaller than the vectors
    * at the defaults.
    */
  def encode(corpus: DataFrame, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Partitioning.forCompute(unit(corpus, "cand_id", idCol, vecCol))
      .select(col("cand_id"), codesFor(col("vd"), model).as("codes"))

  /** ADC lookup table for a unit query vector: entry j·k+c holds the
    * rank-equivalent distance ‖c‖² − 2·q_j·c (the per-query ‖q_j‖²
    * terms are candidate-independent, the [[CentroidAssign]] argmin
    * identity). One typed literal carries (subspace, ‖c‖², centroid).
    */
  private def distTable(qd: Column, model: PqModel): Column = {
    val packed: Seq[(Int, Double, Seq[Double])] =
      for (j <- 0 until model.m; cc <- 0 until model.k) yield {
        val v = model.centroids(j)(cc)
        (j, v.map(x => x * x).sum, v.toSeq)
      }
    transform(typedLit(packed), e =>
      e.getField("_2") - lit(2.0) * VectorFunctions.dotDouble(
        slice(qd, e.getField("_1") * model.subDim + 1, lit(model.subDim)),
        e.getField("_3")))
  }

  /** IVF + ADC — the composed billion-scale index (FAISS "IVFPQ"
    * without residual refinement, documented below): a coarse
    * full-vector k-means partitions the corpus into `nCells` inverted
    * lists; search probes the `nProbe` cells nearest the query and
    * ADC-ranks ONLY their members, so the scan fraction is
    * ~nProbe/nCells of [[adcTopK]]'s full pass on top of the same
    * 12-byte codes. Probing ALL cells recovers [[adcTopK]] exactly
    * (spec-pinned equivalence — the cell stage is a pure candidate
    * restriction). Classic IVFADC additionally re-trains PQ on the
    * residuals v − c_cell for finer quantization; that refinement
    * slots in at the `codesFor` call without changing any plan shape.
    *
    * Plan: coarse training = `coarseIters` scans with the
    * [[CentroidAssign]] value-literal argmin; the index pass emits
    * (cand_id, cell, codes) in one projection; probes broadcast while
    * queries×nProbe is broadcast-small with the same stats-estimate
    * fallback to a shuffle join as [[SimilaritySearch.ivfTopK]].
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      model: PqModel, nCells: Int = 16, nProbe: Int = 6,
      coarseIters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = Partitioning.forCompute(unit(corpus, "cand_id", idCol, vecCol))
      .cache()
    try {
      var coarse: Array[(Int, Seq[Double])] = c
        .orderBy(md5(col("cand_id").cast("string"))).limit(nCells)
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1)) }
      for (_ <- 1 to coarseIters) {
        val means = c.select(
            element_at(CentroidAssign.nearestCells(col("vd"), coarse, 1), 1)
              .getField("cell").as("cell"),
            col("vd"))
          .select(col("cell"), posexplode(col("vd")).as(Seq("d", "x")))
          .groupBy(col("cell"), col("d")).agg(avg(col("x")).as("m"))
          .collect()
        val next = coarse.map { case (i, v) => i -> v.toArray }.toMap
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        coarse = coarse.map { case (i, _) => (i, next(i).toSeq) }
      }
      val indexed = c.select(col("cand_id"),
        element_at(CentroidAssign.nearestCells(col("vd"), coarse, 1), 1)
          .getField("cell").as("cell"),
        codesFor(col("vd"), model).as("codes"))
      val probed = unit(queries, "query_id", idCol, vecCol)
        .select(col("query_id"), distTable(col("vd"), model).as("tbl"),
          explode(transform(
            CentroidAssign.nearestCells(col("vd"), coarse, nProbe),
            _.getField("cell"))).as("cell"))
      val bcLimit = BigInt(
        corpus.sparkSession.sessionState.conf.autoBroadcastJoinThreshold)
      val probeEst =
        queries.queryExecution.optimizedPlan.stats.sizeInBytes * nProbe
      val probeJoin =
        if (bcLimit > 0 && probeEst <= bcLimit)
          broadcast(probed).join(indexed, Seq("cell"))
        else probed.join(indexed, Seq("cell"))
      val scored = probeJoin
        .where(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0),
            (acc, j) => acc + element_at(col("tbl"),
              j * model.k + element_at(col("codes"), j + 1) + 1))
            .as("adc_dist"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist").asc, col("cand_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col("query_id"), col("cand_id"),
          round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
    } finally { c.unpersist(); () }
  }

  /** Approximate top-k by ADC distance over PQ codes: per query the
    * m·k table (exact arithmetic, broadcast with the query row), per
    * candidate m array lookups, per-query top-k window (ascending
    * distance, candidate id tiebreak). The candidate pass never
    * touches the original vectors — that is the point.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, topK: Int,
      model: PqModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = unit(queries, "query_id", idCol, vecCol)
      .select(col("query_id"), distTable(col("vd"), model).as("tbl"))
    val scored = broadcast(q)
      .join(encoded, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        aggregate(sequence(lit(0), lit(model.m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("tbl"),
            j * model.k + element_at(col("codes"), j + 1) + 1))
          .as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("cand_id"),
        round(col("adc_dist"), 6).as("adc_dist"), col("rank"))
  }
}

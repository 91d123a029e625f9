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

  /** Element-wise per-cell means of a (cell, array<double>) frame as
    * ONE mapper-only job: each partition folds its rows into a dense
    * (sums, count) map over the bounded cell set, partials merge
    * driver-side in partition order, mean = Σ/n. Replaces the Lloyd
    * loops' `posexplode(vd) → groupBy(cell, d) → avg` shape, which
    * materialized dim× the row count into a shuffle every round
    * (guide §2.3 "aggregate before you shuffle"; the explode was the
    * round's dominant volume). Mean values are identical up to double-
    * summation order, which the shuffled avg() never pinned either —
    * every consumer gates on recall/MSE, not centroid bytes
    * (the [[trainCells]] scaladoc's contract). Cells absent from the
    * frame are absent from the result (empty cells keep their previous
    * centroid, as before). Driver state: ≤ nPartitions × nCells × dim
    * doubles — bounded by the cell budget, same contract as the
    * per-round collect it replaces.
    */
  def cellMeans(assigned: org.apache.spark.sql.DataFrame,
      cellCol: String = "cell",
      vdCol: String = "vd"): Array[(Int, Array[Double])] = {
    import org.apache.spark.sql.functions.col
    val spark = assigned.sparkSession
    import spark.implicits._
    val partials: Array[(Int, Array[Double], Long)] = assigned
      // a null vector yields a null cell (NearestCellsExpr is null-safe);
      // decoding null into the non-nullable Int field would throw, where
      // the replaced groupBy(cell) silently dropped the row — keep that
      // drop-malformed-rows behavior explicitly
      .filter(col(cellCol).isNotNull)
      .select(col(cellCol).cast("int"), col(vdCol))
      .as[(Int, Array[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Array[Double], Long)]
        it.foreach { case (cell, v) =>
          if (v != null) {
            val e = acc.getOrElseUpdate(cell, (new Array[Double](v.length), 0L))
            val s = e._1
            var i = 0
            val n = math.min(v.length, s.length)
            while (i < n) { s(i) += v(i); i += 1 }
            acc(cell) = (s, e._2 + 1)
          }
        }
        acc.iterator.map { case (c, (s, n)) => (c, s, n) }
      }.collect()
    val merged = scala.collection.mutable.LinkedHashMap
      .empty[Int, (Array[Double], Long)]
    partials.foreach { case (c, s, n) =>
      merged.get(c) match {
        case None => merged(c) = (s, n)
        case Some((t, m)) =>
          var i = 0
          val k = math.min(s.length, t.length)
          while (i < k) { t(i) += s(i); i += 1 }
          merged(c) = (t, m + n)
      }
    }
    merged.iterator
      .map { case (c, (s, n)) => (c, s.map(_ / n)) }
      .toArray.sortBy(_._1)
  }

  /** [[cellMeans]] with ORDER-INDEPENDENT decimal accumulation — the
    * dense mapper-only twin of `avg(x.cast(decimal(28,18)))` for the
    * [[SemDedup]] Lloyd loop, whose determinism claim (centroids
    * bit-identical across partitionings/runs) needs exact sums. Each
    * term quantizes to scale 18 HALF_UP (Spark's double→decimal cast
    * rule), sums are exact BigDecimal (associative/commutative), and
    * the mean replays Average-over-decimal's arithmetic: divide at
    * scale 22 HALF_UP (decimal(32,22) result type), then cast to
    * double — value-identical to the shuffled decimal avg it replaces.
    */
  def cellMeansDecimal(assigned: org.apache.spark.sql.DataFrame,
      cellCol: String = "cell",
      vdCol: String = "vd"): Array[(Int, Array[Double])] = {
    import org.apache.spark.sql.functions.col
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = assigned.sparkSession
    import spark.implicits._
    def q(x: Double): JBD =
      JBD.valueOf(x).setScale(18, RoundingMode.HALF_UP)
    val partials: Array[(Int, Array[JBD], Long)] = assigned
      // null cells dropped, matching the replaced groupBy — see cellMeans
      .filter(col(cellCol).isNotNull)
      .select(col(cellCol).cast("int"), col(vdCol))
      .as[(Int, Array[Double])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Array[JBD], Long)]
        it.foreach { case (cell, v) =>
          if (v != null) {
            val e = acc.getOrElseUpdate(cell,
              (Array.fill(v.length)(JBD.ZERO), 0L))
            val s = e._1
            var i = 0
            val n = math.min(v.length, s.length)
            while (i < n) { s(i) = s(i).add(q(v(i))); i += 1 }
            acc(cell) = (s, e._2 + 1)
          }
        }
        acc.iterator.map { case (c, (s, n)) => (c, s, n) }
      }.collect()
    val merged = scala.collection.mutable.LinkedHashMap
      .empty[Int, (Array[JBD], Long)]
    partials.foreach { case (c, s, n) =>
      merged.get(c) match {
        case None => merged(c) = (s, n)
        case Some((t, m)) =>
          var i = 0
          val k = math.min(s.length, t.length)
          while (i < k) { t(i) = t(i).add(s(i)); i += 1 }
          merged(c) = (t, m + n)
      }
    }
    merged.iterator
      .map { case (c, (s, n)) =>
        (c, s.map(_.divide(JBD.valueOf(n), 22, RoundingMode.HALF_UP)
          .doubleValue))
      }
      .toArray.sortBy(_._1)
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
      val means = cellMeans(assigned)
        .map { case (i, v) => (i, v.toSeq: Seq[Double]) }
      if (means.nonEmpty) centroids = means
    }
    centroids
  }
}

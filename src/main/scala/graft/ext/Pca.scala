package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.VectorFunctions

/** Distributed PCA / embedding whitening — the linear-algebra stage a
  * training-data pipeline runs before semantic dedup or ANN indexing
  * (SemDeDup — Abbas et al. 2023 — operates in a reduced space;
  * whitening is the standard conditioning step for cosine retrieval,
  * e.g. Jégou & Chum 2012, "Negative evidences and co-occurrences in
  * image retrieval: the benefit of PCA and whitening").
  *
  * Scale shape: fitting is ONE aggregate pass — each row expands its
  * d-vector into the (1, first-moment, upper-triangular second-moment)
  * array (length 1 + d + d(d+1)/2, scan-stage `transform`/`flatten`),
  * one `posexplode`, and a hash aggregate over ≤ 2 145 keys (d = 64);
  * partial aggregation collapses everything map-side, so the shuffle
  * carries O(d²) rows per partition regardless of corpus size. The
  * d×d eigenproblem is driver-side cyclic Jacobi — O(d³) on ≤ 2080
  * doubles, bounded by construction (document d ≲ 1024; beyond that
  * you want a randomized sketch, not exact PCA). Projection and
  * reconstruction are pure per-row projections against ONE typed
  * literal (the [[CentroidAssign]] value-literal rule: shape-constant
  * generated code, centroid/component values ride in `references`).
  *
  * Determinism: all moment sums accumulate in DECIMAL(38,18) — double
  * partial-merge order would drift centroids/eigenvectors by ULPs
  * between partitionings — and the Jacobi sweep order, eigenvalue sort
  * (descending, index tie-break) and sign convention (largest-|coeff|
  * coordinate positive, first index on ties) are all fixed, so
  * `fit` is bit-identical across partitionings (spec-pinned).
  *
  * Covariance is the POPULATION (1/n) form, so component-wise variance
  * of the projected corpus equals the eigenvalue exactly — the q124
  * invariant gate replays that equality, plus orthonormality and
  * full-rank reconstruction, end to end.
  */
object Pca {

  /** Full-rank model: `components(j)` is the j-th eigenvector (length
    * `dim`), eigenvalues descending; `totalVariance` = trace of the
    * population covariance.
    */
  final case class Model(
      dim: Int,
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def totalVariance: Double = eigenvalues.sum
  }

  /** Fit a full-rank PCA model. Rows whose vector is null, has a null
    * element, or disagrees with the (max-size) dimensionality are
    * dropped — the same malformed-row rule as the k-means family.
    */
  def fit(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Model = {
    val v0 = corpus.select(transform(col(vecCol), _.cast("double")).as("v"))
      .filter(col("v").isNotNull)
    // dimensionality: one bounded aggregate (a single int to the driver)
    val dim = v0.agg(max(size(col("v")))).head().getInt(0)
    require(dim >= 1, "no non-null vectors to fit")
    // the O(d²)-per-row moment loop below is the expensive stage; a
    // small corpus arriving as one parquet split would run it on a
    // single core (guide §2.5 input-parallelism shape). Widening is
    // value-free: per-term quantized BigDecimal sums are exactly
    // partition-order-independent (the determinism pin below).
    val v = graft.core.Partitioning.forCompute(
      v0.filter(size(col("v")) === dim && !exists(col("v"), _.isNull)))

    // one pass: [1 | x | upper-tri(x xᵀ)] summed per index. The
    // per-row product loop runs as primitive per-partition code (a
    // higher-order-function formulation is CodegenFallback — measured
    // 10 s of boxed-lambda interpretation at sf0.1 vs 0.5 s here);
    // per-partition partials accumulate in EXACT BigDecimal (addition
    // is associative/commutative exactly, so the result is
    // partition-order-free), and the final merge of the tiny partial
    // frame (n_partitions × (1+d+d(d+1)/2) rows) is a decimal hash
    // aggregate — bit-determinism preserved end to end.
    val nMoments = 1 + dim + dim * (dim + 1) / 2
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val moments = v.select(col("v")).as[Seq[Double]]
      .mapPartitions { it =>
        // quantize each TERM to scale 18 (HALF_UP — Spark's own
        // double→decimal cast rule) BEFORE accumulating: per-term
        // rounding is value-deterministic, so the partials stay
        // partition-order-free AND inside decimal(38,18)
        def q(x: Double): java.math.BigDecimal =
          java.math.BigDecimal.valueOf(x)
            .setScale(18, java.math.RoundingMode.HALF_UP)
        val acc = Array.fill(nMoments)(java.math.BigDecimal.ZERO)
        var rows = 0L
        it.foreach { row =>
          val a = row.toArray
          rows += 1
          var i = 0
          while (i < a.length) {
            acc(1 + i) = acc(1 + i).add(q(a(i)))
            i += 1
          }
          var p = 1 + a.length
          i = 0
          while (i < a.length) {
            var j = i
            while (j < a.length) {
              acc(p) = acc(p).add(q(a(i) * a(j)))
              p += 1; j += 1
            }
            i += 1
          }
        }
        acc(0) = java.math.BigDecimal.valueOf(rows)
        acc.iterator.zipWithIndex.map { case (s, p) => (p, s) }
      }
      .toDF("p", "s")
      .groupBy("p")
      .agg(sum(col("s").cast("decimal(38,18)")).cast("double").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    val n = moments(0).toLong
    require(n >= 1, "no valid vectors to fit")
    val mean = Array.tabulate(dim)(d => moments(1 + d) / n)
    // unflatten the triangle: base offset of row i is Σ_{r<i} (dim - r)
    val triBase = Array.tabulate(dim)(i => i * dim - i * (i - 1) / 2)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      moments(1 + dim + triBase(a) + (b - a)) / n - mean(i) * mean(j)
    }

    val (eigVals, eigVecs) = jacobiEigen(cov)
    // descending eigenvalue, original-index tie-break; sign-fix each
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i))
    val comps = order.map { i =>
      val c = Array.tabulate(dim)(d => eigVecs(d)(i))
      val pivot = c.indices.maxBy(d => (math.abs(c(d)), -d))
      if (c(pivot) < 0) c.map(-_) else c
    }.toArray
    Model(dim, n, mean, order.map(eigVals).toArray, comps)
  }

  /** Project to the top `k` components: (id, proj array<double>).
    * `whiten = true` scales component j by 1/√λⱼ (unit variance);
    * components with λ ≤ `eps` are passed through unscaled rather
    * than exploding a null direction.
    */
  def project(corpus: DataFrame, model: Model, k: Int,
      whiten: Boolean = false, eps: Double = 1e-12,
      idCol: String = "vec_id", vecCol: String = "embedding",
      outCol: String = "proj"): DataFrame = {
    require(k >= 1 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === model.dim &&
        !exists(col(vecCol), _.isNull))
      .select(col(idCol), centeredCol(col(vecCol), model).as("c"))
      .select(col(idCol), projOfCentered(col("c"), model, k, whiten, eps)
        .as(outCol))
  }

  /** x − mean as array<double> — the projection's shared first stage. */
  private def centeredCol(vec: Column, model: Model): Column =
    zip_with(transform(vec, _.cast("double")),
      typedLit(model.mean.toSeq), (x, m) => x - m)

  /** Top-k projection of an already-centered vector column — the exact
    * expression [[project]] builds (same packed literal, same dot and
    * scale arithmetic), exposed so [[violations]] can carry the original
    * vector and its projection in ONE frame.
    */
  private def projOfCentered(c: Column, model: Model, k: Int,
      whiten: Boolean, eps: Double): Column = {
    val packed: Seq[(Seq[Double], Double)] =
      (0 until k).map { j =>
        val s = if (whiten && model.eigenvalues(j) > eps)
          1.0 / math.sqrt(model.eigenvalues(j)) else 1.0
        (model.components(j).toSeq, s)
      }
    transform(typedLit(packed), p =>
      VectorFunctions.dotDouble(c, p.getField("_1")) * p.getField("_2"))
  }

  /** Reconstruct from a full-rank, unwhitened projection: mean + Vᵀp.
    * Per-row scan-stage work against one typed literal (the transposed
    * component matrix packed with the mean).
    */
  def reconstruct(projected: DataFrame, model: Model,
      idCol: String = "vec_id", projCol: String = "proj",
      outCol: String = "recon"): DataFrame =
    projected.select(col(idCol), reconCol(col(projCol), model).as(outCol))

  /** mean + Vᵀp of a projection column — [[reconstruct]]'s expression,
    * exposed for the fused reconstruction check in [[violations]].
    */
  private def reconCol(proj: Column, model: Model): Column = {
    val packedT: Seq[(Double, Seq[Double])] =
      (0 until model.dim).map { d =>
        (model.mean(d), model.components.map(_(d)).toSeq)
      }
    transform(typedLit(packedT), m =>
      m.getField("_1") +
        VectorFunctions.dotDouble(proj, m.getField("_2")))
  }

  /** Zero-row invariant gate (q124): violations of
    *  - eigenvalue order/positivity and Σλ = trace accounting,
    *  - component orthonormality (driver-side, d² dots),
    *  - per-component projected variance = λⱼ (population form, decimal
    *    accumulation, so the equality is exact-to-tolerance under ANY
    *    partitioning),
    *  - whitened variance = 1 for non-degenerate components,
    *  - full-rank per-row reconstruction (max-|err| ≤ tol).
    */
  def violations(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", tol: Double = 1e-7): DataFrame = {
    val spark = corpus.sparkSession
    val m = fit(corpus, idCol, vecCol)
    val scale = math.max(1.0, m.totalVariance)

    val driver = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (j <- 1 until m.dim)
      if (m.eigenvalues(j) > m.eigenvalues(j - 1) + tol * scale)
        driver += (("eigen_not_descending", s"j=$j"))
    for (j <- 0 until m.dim)
      if (m.eigenvalues(j) < -tol * scale)
        driver += (("eigen_negative", s"j=$j lambda=${m.eigenvalues(j)}"))
    for (i <- 0 until m.dim; j <- i until m.dim) {
      val dotIj = (0 until m.dim)
        .map(d => m.components(i)(d) * m.components(j)(d)).sum
      val want = if (i == j) 1.0 else 0.0
      if (math.abs(dotIj - want) > 1e-9)
        driver += (("not_orthonormal", s"i=$i j=$j dot=$dotIj"))
    }
    // Σλ; the projected-variance total below must conserve it
    val trace = m.totalVariance

    // ONE cached frame carrying the original vector and its full-rank
    // unwhitened projection (projOfCentered = project()'s expression
    // verbatim): feeds the per-component moment aggregate AND the
    // reconstruction check. The previous shape re-scanned the corpus
    // for the reconstruction leg and re-attached it with an equi-join
    // (guide §2.4: a join whose only purpose is to re-pair rows the
    // scan already had together is a removable exchange), and
    // recomputed the perComp aggregate once per violation family
    // (3×, uncached).
    val proj = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === m.dim &&
        !exists(col(vecCol), _.isNull))
      .select(col(idCol),
        transform(col(vecCol), _.cast("double")).as("x"),
        centeredCol(col(vecCol), m).as("c"))
      .select(col(idCol), col("x"),
        projOfCentered(col("c"), m, m.dim, whiten = false, eps = 1e-12)
          .as("proj"))
      .cache()

    // per-component moments: ONE aggregate, collected (≤ dim rows —
    // driver-bounded by construction, the same contract as the model
    // collect in fit()); the variance / whitened-variance / trace
    // comparisons are scalar driver arithmetic on those dim rows,
    // replacing three distributed legs over a recomputed aggregate.
    // Arithmetic is unchanged: v = s2/cnt − (s1/cnt)² in double, the
    // trace total as decimal(38,18) per-term HALF_UP quantization —
    // the exact expressions the Spark legs evaluated.
    val perComp: Array[(Int, Double)] = proj
      .select(posexplode(col("proj")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum(col("x").cast("decimal(38,18)")).cast("double").as("s1"),
        sum((col("x") * col("x")).cast("decimal(38,18)")).cast("double")
          .as("s2"),
        count(lit(1)).as("cnt"))
      .collect()
      .map { r =>
        val (s1, s2, cnt) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
        r.getInt(0) -> (s2 / cnt - (s1 / cnt) * (s1 / cnt))
      }
      .sortBy(_._1)
    for ((j, v) <- perComp) {
      val lambda = m.eigenvalues(j)
      if (math.abs(v - lambda) > tol * scale)
        driver += (("variance_ne_lambda", s"j=$j var=$v lambda=$lambda"))
      if (lambda > 1e-9 * scale && math.abs(v / lambda - 1.0) > 1e-5)
        driver += (("whitened_variance_ne_one",
          s"j=$j var_ratio=${v / lambda}"))
    }
    val tot = perComp
      .map { case (_, v) =>
        java.math.BigDecimal.valueOf(v)
          .setScale(18, java.math.RoundingMode.HALF_UP)
      }
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
    if (math.abs(tot - trace) > tol * scale * m.dim)
      driver += (("trace_not_conserved",
        s"projected_total=$tot sum_lambda=$trace"))

    val driverDf = spark.createDataFrame(
      spark.sparkContext.parallelize(driver.toSeq.map(Row.fromTuple), 1),
      StructType(Seq(StructField("kind", StringType),
        StructField("detail", StringType))))

    // full-rank reconstruction: per-row max-|err| — recon and original
    // ride the SAME cached row now, no join
    val reconViol = proj
      .select(col(idCol),
        aggregate(zip_with(reconCol(col("proj"), m), col("x"),
            (a, b) => abs(a - b)),
          lit(0.0), (acc, e) => greatest(acc, e)).as("err"))
      .filter(col("err") > 1e-6)
      .select(lit("reconstruction_error").as("kind"),
        concat(lit("id="), col(idCol), lit(" err="), col("err"))
          .as("detail"))

    driverDf.unionByName(reconViol)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns V with A·V(:,i) = λᵢ·V(:,i)).
    * Deterministic sweep order (row-major upper triangle), fixed
    * convergence threshold — bounded driver math on d×d.
    */
  private[ext] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val frob = math.sqrt(a0.map(_.map(x => x * x).sum).sum)
    val tol = if (frob > 0) 1e-14 * frob else 0.0
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > tol) {
          val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = math.signum(tau) match {
            case 0.0 => 1.0
            case s => s / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
          }
          val c = 1.0 / math.sqrt(1.0 + t * t)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      for (p <- 0 until d; q <- p + 1 until d)
        off = math.max(off, math.abs(a(p)(q)))
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}

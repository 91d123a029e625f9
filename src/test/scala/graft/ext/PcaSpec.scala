package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Pins the PCA/whitening stage: the Jacobi eigensolver against
  * hand-checkable matrices, analytic recovery of a planted covariance,
  * bit-deterministic fitting across partitionings, the projection/
  * whitening/reconstruction laws, malformed-row hygiene, and the
  * zero-row invariant gate on the real embeddings fixture.
  */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("jacobi: hand-checked 2x2 and diagonal eigensystems") {
    // [[2,1],[1,2]] → λ = {3, 1}, vectors (1,1)/√2 and (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12)
    assert(math.abs(sorted(1) - 1.0) < 1e-12)
    // eigen-equation check A v = λ v for both columns
    for (c <- 0 to 1) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      assert(math.abs(av(0) - vals(c) * v(0)) < 1e-12)
      assert(math.abs(av(1) - vals(c) * v(1)) < 1e-12)
    }
    // already-diagonal input: eigenvalues are the diagonal, V = I
    val (dv, dV) = Pca.jacobiEigen(
      Array(Array(5.0, 0.0), Array(0.0, -2.0)))
    assert(dv.toSeq === Seq(5.0, -2.0))
    assert(dV(0)(0) === 1.0 && dV(1)(1) === 1.0)
  }

  test("fit recovers a planted axis-aligned covariance analytically") {
    // x = (±a, ±b) grid, all four sign combinations equally: mean 0,
    // cov = diag(a², b²) exactly — eigenpairs are the axes.
    val a = 3.0; val b = 0.5
    val rows = for (sa <- Seq(-1, 1); sb <- Seq(-1, 1))
      yield (sa.toLong * 10 + sb, Seq((sa * a).toFloat, (sb * b).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df)
    assert(m.n === 4 && m.dim === 2)
    assert(m.mean.forall(x => math.abs(x) < 1e-12))
    assert(math.abs(m.eigenvalues(0) - a * a) < 1e-9)
    assert(math.abs(m.eigenvalues(1) - b * b) < 1e-9)
    // sign convention: largest-|coeff| coordinate positive
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9)
  }

  test("fit is bit-identical across partitionings (decimal moments)") {
    val emb = Tables.embeddings(spark, sf0001)
    val m1 = Pca.fit(emb.repartition(1))
    val m7 = Pca.fit(emb.repartition(7, col("vec_id")))
    assert(m1.n === m7.n)
    assert(m1.mean.toSeq === m7.mean.toSeq)
    assert(m1.eigenvalues.toSeq === m7.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ===
      m7.components.map(_.toSeq).toSeq)
  }

  test("malformed rows (null vec, null element, wrong dim) are dropped") {
    val rows: Seq[(Long, Seq[Option[Float]])] = Seq(
      1L -> Seq(Some(1.0f), Some(2.0f)),
      2L -> Seq(Some(3.0f), Some(4.0f)),
      3L -> null,
      4L -> Seq(Some(5.0f)),
      5L -> Seq(None, Some(2.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df)
    assert(m.n === 2 && m.dim === 2)
    val projected = Pca.project(df, m, 2)
    assert(projected.select("vec_id").as[Long].collect().sorted
      === Array(1L, 2L))
  }

  test("projection laws on the fixture: variance=λ, whiten=1, reconstruction") {
    val emb = Tables.embeddings(spark, sf0001)
    val v = Pca.violations(emb)
    assert(v.count() === 0,
      v.collect().take(5).mkString("; "))
  }

  test("whitened projection is the plain projection scaled by 1/sqrt(lambda)") {
    val emb = Tables.embeddings(spark, sf0001)
    val m = Pca.fit(emb)
    val scales = m.eigenvalues.map(l =>
      if (l > 1e-12) 1.0 / math.sqrt(l) else 1.0).toSeq
    val scaled = Pca.project(emb, m, m.dim)
      .select(col("vec_id"),
        zip_with(col("proj"), typedLit(scales), (p, s) => p * s).as("proj"))
    val wproj = Pca.project(emb, m, m.dim, whiten = true)
    val diff = scaled.as("a").join(wproj.as("b"), "vec_id")
      .filter(col("a.proj") =!= col("b.proj"))
    assert(diff.count() === 0)
  }

  test("top-k projection truncates the full-rank projection exactly") {
    val emb = Tables.embeddings(spark, sf0001)
    val m = Pca.fit(emb)
    val full = Pca.project(emb, m, m.dim)
      .select(col("vec_id"), slice(col("proj"), 1, 3).as("proj"))
    val top3 = Pca.project(emb, m, 3)
    val diff = full.as("a").join(top3.as("b"), "vec_id")
      .filter(col("a.proj") =!= col("b.proj"))
    assert(diff.count() === 0)
  }
}

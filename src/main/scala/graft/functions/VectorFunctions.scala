package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, built from
  * codegen'd higher-order functions (`transform`/`zip_with`/`aggregate`)
  * — no UDFs, no serialization breaks, scans stay columnar.
  *
  * All arithmetic is widened to double at the leaves so results are
  * bit-stable across engines (the DuckDB oracle mirrors the same
  * index-order double accumulation).
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, _.cast("double"))

  /** Σ aᵢ·bᵢ in index order, double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), _ * _), lit(0.0), _ + _)

  /** dot for ALREADY-double arrays via the native codegen expression
    * ([[graft.plans.DotProductExpr]]) — a tight primitive loop, no
    * zipped-array allocation, no boxed lambda evaluation. Use on
    * pre-normalized/pre-widened columns in pairwise hot paths.
    */
  def dotDouble(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.DotProductExpr(
      bridge.expression(a), bridge.expression(b)))
  }

  /** Unit-normalize (L2) via the native codegen expression
    * ([[graft.plans.NormalizeExpr]]): array<float|double> →
    * array<double>, null for null/zero-norm input. One fused primitive
    * loop instead of the three-HOF cast→norm→scale chain — the head of
    * every similarity pipeline.
    */
  def normalize(a: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.NormalizeExpr(bridge.expression(a)))
  }

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(d(a), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(normSq(a)) * sqrt(normSq(b))
    when(denom > 0, dot(a, b) / denom)
  }
}

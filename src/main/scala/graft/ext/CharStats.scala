package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Partitioning

/** Character-level diversity signals — the charset-anomaly quality
  * family (binary junk, mojibake, single-character floods, "aaaa…"
  * spam) that complements the token-level [[RepetitionStats]]:
  *
  *  - `n_distinct_chars` — alphabet size actually used.
  *  - `top_char_frac`    — most frequent character's share; ≈1 ⇒ a
  *    one-character flood.
  *  - `simpson_e6`       — Simpson concentration Σ(c/n)², the
  *    collision probability of two random character draws; the
  *    entropy-family signal EXPRESSED WITHOUT TRANSCENDENTALS.
  *
  * Both ratio signals are FIXED-POINT ×10⁶ longs (the [[PageRank]]
  * numerics): `round(double, 6)` is NOT portable — Spark rounds the
  * exact binary expansion via BigDecimal while DuckDB rounds in
  * floating point, and a value landing exactly on a .5·10⁻⁶ boundary
  * (e.g. Σc²/n² = 598/6400 at sf0.1) splits them by one ulp of output.
  *  Integer `DIV` has no rounding step at all. Safe for documents to
  * ~3·10⁶ chars even in the pathological single-character case
  * (n²·10⁶ < 2⁶³).
  *
  * Plan shape: character explode via `sequence` + `substr` (dialect-
  * portable, no empty-pattern split edge cases), then the two-level
  * hash agg keyed on (doc, char) — map-side combine collapses repeats
  * so shuffle volume is bounded by docs × alphabet, NOT corpus
  * character count. The left join back to the id spine keeps
  * zero-length documents (null signals, 0 distinct).
  */
object CharStats {

  def charStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        length(col(textCol)).as("n_chars"))
    val perChar = base.filter(col("n_chars") > 0)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), col("n_chars"))).as("i"))
      .select(col("doc_id"), col("__t").substr(col("i"), lit(1)).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"), max(col("c")).as("maxc"),
        sum(col("c") * col("c")).as("ss"), sum(col("c")).as("n"))
    base.select(col("doc_id"), col("n_chars"))
      .join(perChar, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct_chars"),
        expr("(maxc * 1000000) DIV n").as("top_char_frac_e6"),
        expr("(ss * 1000000) DIV (n * n)").as("simpson_e6"))
  }
}

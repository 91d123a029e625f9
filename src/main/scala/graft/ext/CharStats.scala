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
  *  - `simpson`          — Simpson concentration Σ(c/n)², the
  *    collision probability of two random character draws; the
  *    entropy-family signal EXPRESSED WITHOUT TRANSCENDENTALS: Σc² is
  *    exact integer arithmetic and the single double division is IEEE-
  *    exact, so the oracle reproduces it bit-for-bit (same reasoning
  *    as TfIdf's reciprocal-df weighting — ln/log2 differ across libm
  *    implementations, ratios of exact integers never do).
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
        round(col("maxc").cast("double") / col("n"), 6).as("top_char_frac"),
        round(col("ss").cast("double") / col("n") / col("n"), 6).as("simpson"))
  }
}

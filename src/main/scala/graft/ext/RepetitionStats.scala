package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** Per-document repetition signals — the MassiveText/Gopher quality-
  * filter family (Rae et al. 2021, appendix A1.1: "fraction of
  * characters in the most common n-gram", "fraction of characters in
  * duplicate n-grams"), token-denominated here so the DuckDB oracle
  * reproduces the arithmetic exactly:
  *
  *  - `top_bigram_frac`  — fraction of tokens covered by the single
  *    most frequent word bigram (occurrences × 2 / tokens, capped at
  *    1.0 since occurrences may overlap). High ⇒ boilerplate loops,
  *    keyword stuffing.
  *  - `dup_trigram_frac` — fraction of trigram INSTANCES that repeat
  *    an earlier instance (1 − distinct/total). High ⇒ templated or
  *    machine-repeated text.
  *
  * Plan shape: one narrow projection builds the token array, a second
  * derives both gram arrays from the materialized column (the lambda
  * re-evaluation trap — deriving grams straight from `split(...)`
  * would re-tokenize once per reference), then each gram family is an
  * explode → two-level hash aggregation keyed on (doc, gram) — partial
  * map-side combine collapses the repeats that these signals measure,
  * so shuffle volume is the DISTINCT gram count, not the token count.
  * The gram frame is cached before the explodes: it feeds three
  * consumers, and InferFiltersFromGenerate would otherwise push the
  * whole HOF chain into a per-row generator filter (trap #7).
  */
object RepetitionStats {

  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    statsManaged(docs, idCol, textCol)._1

  /** [[stats]] plus a release handle for the internal gram-frame cache —
    * looped callers must release after consuming.
    */
  def statsManaged(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, () => Unit) = {
    val sp = lit(" ")
    val words = col("words")
    val n1 = greatest(size(words) - 1, lit(0))
    val n2 = greatest(size(words) - 2, lit(0))
    val grams = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        split(TextFunctions.normalized(col(textCol)), " ").as("words"))
      .select(col("doc_id"), col("n_tokens"),
        zip_with(slice(words, lit(1), n1), slice(words, lit(2), n1),
          (a, b) => concat(a, sp, b)).as("bigrams"),
        zip_with(
          zip_with(slice(words, lit(1), n2), slice(words, lit(2), n2),
            (a, b) => concat(a, sp, b)),
          slice(words, lit(3), n2),
          (ab, c) => concat(ab, sp, c)).as("trigrams"))
      .cache()

    val bstat = grams.select(col("doc_id"), explode(col("bigrams")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topc"))
    val tstat = grams.select(col("doc_id"), explode(col("trigrams")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("tot"), count(lit(1)).as("dist"))

    val out = grams.select(col("doc_id"), col("n_tokens"))
      .join(bstat, Seq("doc_id"), "left")
      .join(tstat, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        // NOT least(coalesce...)/coalesce(least...): both Spark's and
        // DuckDB's least() SKIP null arguments (least(null, 1.0) = 1.0),
        // so a doc with no bigrams would score 1.0 — guard explicitly.
        round(when(col("topc").isNotNull && col("n_tokens") > 0,
            least(col("topc") * lit(2.0) / col("n_tokens"), lit(1.0)))
          .otherwise(lit(0.0)), 6).as("top_bigram_frac"),
        round(coalesce(
          lit(1.0) - col("dist").cast("double") / col("tot"),
          lit(0.0)), 6).as("dup_trigram_frac"))
    (out, () => { grams.unpersist(); () })
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** Corpus-trained bigram language model + per-document likelihood
  * scoring — the CCNet-style "LM quality filter" shape (Wenzek et al.
  * 2020 filter CommonCrawl by LM perplexity; a word-bigram model is
  * the in-engine, dependency-free member of that family): documents
  * whose word transitions are unlike the corpus (gibberish, boilerplate
  * soup, wrong-language) score low and can be dropped by threshold.
  *
  * Model: P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V) — add-α smoothing
  * over the corpus vocabulary V (distinct normalized tokens). The doc
  * score is the MEAN transition probability rather than mean log-prob:
  * per-transition probabilities are rounded to 6 digits first, so each
  * addend is exactly representable in DECIMAL(18,6) and the per-doc sum
  * is order-independent and engine-exact (ln() would put every addend
  * at the mercy of libm rounding; see TfIdf for the same trade).
  *
  * Plan shape: train and score in one pass over the corpus — bigram
  * instances → per-doc-per-bigram counts nb (map-side combine), then
  * corpus stats by re-aggregation (c12 over docs, c1 over w2), a
  * keyed equi-join of the per-doc counts against the two stat tables,
  * and a broadcast of the single-row vocabulary size. Everything
  * shuffles on gram keys; no driver-side state, no UDFs. At 100 TB the
  * model "table" c12 is itself distributed — it never collects.
  */
object NGramLM {

  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame =
    scoreDocsManaged(docs, idCol, textCol, alpha)._1

  /** [[scoreDocs]] plus a release handle for the internal per-doc
    * bigram-count cache (feeds the two stat aggregations and the
    * scoring join).
    */
  def scoreDocsManaged(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): (DataFrame, () => Unit) = {
    require(alpha > 0.0)
    val words = col("words")
    val n1 = greatest(size(words) - 1, lit(0))
    // cached as a PLAN BARRIER (trap #7) as well as for reuse: both
    // explodes below would otherwise get an InferFiltersFromGenerate
    // size(...) > 0 filter with the whole tokenize/zip_with chain
    // substituted into it, re-running tokenization per row; the frame
    // also feeds the vocab pass, the bigram pass, and the final doc list
    val grams = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"),
        split(TextFunctions.normalized(col(textCol)), " ").as("words"))
      .select(col("doc_id"), col("words"),
        zip_with(slice(words, lit(1), n1), slice(words, lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2"))).as("bis"))
      .cache()

    // vocabulary size: distinct normalized tokens corpus-wide (split("")
    // yields [""] — not a token, filtered like TfIdf does)
    val vocab = grams.select(explode(words).as("w")).filter(col("w") =!= "")
      .agg(countDistinct(col("w")).as("v"))

    // per-doc-per-bigram instance counts: the smallest frame that still
    // carries all information for both training re-aggs AND scoring
    val nb = grams
      .select(col("doc_id"), explode(col("bis")).as("bi"))
      .select(col("doc_id"), col("bi.w1").as("w1"), col("bi.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("nb"))
      .cache()

    val c12 = nb.groupBy(col("w1"), col("w2")).agg(sum(col("nb")).as("c12"))
    val c1 = nb.groupBy(col("w1")).agg(sum(col("nb")).as("c1"))

    // p rounded to 6 digits → exact in DECIMAL(18,6); nb·p stays exact,
    // so the per-doc sum is independent of partial-agg order
    val scored = nb
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("nb"),
        (col("nb") * round((col("c12") + lit(alpha)) /
            (col("c1") + lit(alpha) * col("v")), 6)
          .cast("decimal(18,6)")).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("nb")).as("n_bigrams"),
        round(sum(col("contrib")).cast("double") / sum(col("nb")), 6)
          .as("avg_prob"))

    val out = grams.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_prob"))
    (out, () => { nb.unpersist(); grams.unpersist(); () })
  }
}

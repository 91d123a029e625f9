package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — the classic relevance/topic signal (Salton & Buckley
  * 1988), used in training pipelines for topic balancing and as a
  * cheap keyword/tag extractor.
  *
  * Weighting is tf × (N/df) — the reciprocal-df (linear-idf) member of
  * the TF-IDF family rather than tf × ln(N/df): every operation is an
  * IEEE-exact double multiply/divide, so the DuckDB oracle reproduces
  * scores bit-for-bit, where ln() is only correctly-rounded-ish per
  * libm and can flip a round(…, 6) boundary between engines. Swapping
  * `ln` in is a one-expression change; the ranking machinery is
  * identical.
  *
  * Plan shape: tokenize → explode → hash agg on (doc, term) for tf
  * (map-side combine collapses repeats) → re-agg on term for df → one
  * shuffle equi-join tf⋈df on the term dictionary + a broadcast of the
  * single-row corpus count → per-doc window top-k. Ranking orders by
  * the ROUNDED score then term, so tie order is deterministic and
  * engine-independent. No UDFs, no driver-side materialization.
  */
object TfIdf {

  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    topTermsManaged(docs, idCol, textCol, k)._1

  /** [[topTerms]] plus a release handle for the internal tf cache
    * (feeds both the df aggregation and the scoring join).
    */
  def topTermsManaged(docs: DataFrame, idCol: String, textCol: String,
      k: Int): (DataFrame, () => Unit) = {
    require(k >= 1)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // cached as a PLAN BARRIER (trap #7): without it the explode's
    // inferred size(...) > 0 generator filter re-runs the regex
    // normalize+split chain per row at the scan, doubling tokenize cost
    val tok = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"),
        split(TextFunctions.normalized(col(textCol)), " ").as("words"))
      .cache()
    val tf = tok
      .select(col("doc_id"), explode(col("words")).as("term"))
      // Spark's split("") yields [""] where the oracle's regex token
      // extraction yields []; empty terms are not words on either side
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .cache()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * (col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
    val out = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
    (out, () => { tf.unpersist(); tok.unpersist(); () })
  }
}

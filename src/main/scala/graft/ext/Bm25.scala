package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** Okapi BM25 ranked retrieval (Robertson & Walker 1994; the TREC-era
  * probabilistic relevance function that is still the lexical-search
  * baseline every dense retriever is benchmarked against). Scores a
  * fixed query-term set against the corpus and returns the top-k
  * documents — the lexical leg of a hybrid (BM25 + ANN) retrieval
  * stack, and the standard hard-negative miner for embedding training.
  *
  * Like [[TfIdf]], the idf is the RATIONAL (ln-free) member of the
  * family: idf(t) = (N − df + 0.5)/(df + 0.5). Every operation in the
  * score is an IEEE-exact double add/mul/div evaluated in the same
  * parenthesization on both engines, so the DuckDB oracle reproduces
  * per-term scores bit-for-bit where ln() is only libm-correctly-
  * rounded-ish. Swapping ln(1 + ·) in is a one-expression change.
  * Per-document totals sum the ROUNDED per-term scores as
  * DECIMAL(38,6), so partial-aggregation order cannot flip bits.
  *
  * Plan shape (one corpus scan, cached tokenization):
  * tokenize → (a) per-doc length projection, (b) explode restricted to
  * the query-term literal set (an `isin` filter BEFORE the aggregate —
  * the shuffled tf table carries only query-term hits, not the corpus
  * dictionary) → tf hash agg (map-side combine) → df re-agg (≤ |Q|
  * rows, broadcast) → equi-join tf ⋈ dl on doc_id + single-row
  * (N, avgdl) broadcast → decimal per-doc sum → TakeOrdered top-k.
  * At 100 TB: the only data-sized shuffles key on doc_id (tf and dl);
  * everything query-sized is broadcast. No global sort — the top-k is
  * `orderBy.limit` (TakeOrderedAndProject), and the rank column is
  * derived on the ≤ k surviving rows.
  */
object Bm25 {

  /** Top-k documents for `queryTerms`, scored with BM25(k1, b).
    * Output: doc_id, n_terms (distinct query terms hit), score
    * (rounded per-term scores summed exactly), rank.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKManaged(docs, idCol, textCol, queryTerms, k, k1, b)._1

  /** [[topK]] plus a release handle for the internal tokenization
    * cache (feeds the length projection AND the tf explode).
    */
  def topKManaged(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): (DataFrame, () => Unit) = {
    require(queryTerms.nonEmpty && k >= 1)
    // cached as a PLAN BARRIER (trap #7, see TfIdf): the explode's
    // inferred generator filter would otherwise re-run the regex
    // normalize+split chain per row at the scan
    val tok = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"),
        split(TextFunctions.normalized(col(textCol)), " ").as("words"))
      .cache()
    // per-doc length over ALL terms (split("") yields [""] where the
    // oracle's regex extraction yields []; drop empties on both sides)
    val dl = tok.select(col("doc_id"),
      size(filter(col("words"), w => w =!= "")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val tf = tok
      .select(col("doc_id"), explode(col("words")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    // k1+1 and 1−b are folded in DOUBLE on both engines (IEEE add/sub
    // of the same decimal literals — identical bits; the oracle writes
    // (1.2 + 1.0) rather than 2.2, whose nearest double can differ)
    val tfSat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    val perTerm = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(idf * tfSat, 6).as("term_score"))
    val scored = perTerm.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("term_score").cast("decimal(38,6)")).cast("double").as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    // rank over the ≤ k survivors only — the single-partition window
    // never sees more than k rows (the global sort itself is
    // TakeOrderedAndProject, not an Exchange SinglePartition)
    val out = top.withColumn("rank", row_number().over(
      Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
    (out, () => { tok.unpersist(); () })
  }
}

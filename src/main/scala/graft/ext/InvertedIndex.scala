package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional inverted index + exact phrase search — the retrieval
  * primitive BM25 ([[Bm25]]) cannot answer: "which documents contain
  * these words CONSECUTIVELY". The index is the stored artifact
  * (term, doc_id, pos) every search engine builds once; a phrase
  * query then touches only the postings of its own terms.
  *
  * Plan shape: the index build is one corpus scan + posexplode (no
  * shuffle — postings inherit the scan partitioning and are written
  * term-sorted for pushdown). A k-word phrase query is k term-
  * filtered reads of the postings (the `term = w` predicate pushes to
  * the parquet scan of a persisted index) aligned by the classic
  * anchor trick — occurrence i at position p matches anchor p − i —
  * so the query is a k-way EQUI-join on (doc_id, anchor), never a
  * positional range probe. At 100 TB: postings are term-keyed;
  * per-term posting lists are the only rows moved, and a stopword-
  * heavy phrase is bounded by its RAREST term once the join reorders
  * (AQE broadcasts the small legs).
  */
object InvertedIndex {

  /** Build the positional postings table: (term, doc_id, pos), one
    * row per token occurrence, positions 0-based within the document
    * token stream (the [[TfIdf]] tokenization).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(TextFunctions.normalized(col(textCol)), " ")))
      .filter(col("col") =!= "")
      .select(col("col").as("term"), col("doc_id"),
        col("pos").cast("long").as("pos"))

  /** Exact phrase search over a postings table: documents containing
    * `phrase` consecutively. Output: doc_id, n_matches (distinct
    * start positions), first_pos.
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val legs = phrase.zipWithIndex.map { case (w, i) =>
      index.filter(col("term") === w)
        .select(col("doc_id"), (col("pos") - i).as("anchor"))
    }
    val anchors = legs.reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
    anchors.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }
}

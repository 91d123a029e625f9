package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the context-window
  * preparation step of an embedding / RAG / training pipeline: long
  * documents become overlapping windows of `chunkTokens` whitespace
  * tokens, each window carrying its position so downstream consumers
  * can reconstruct provenance (doc_id, chunk_idx, start_tok).
  *
  * Reference scope: the reference pipelines land whole scraped pages
  * (`/root/reference/dags/pull_new_sales_list.py:214` stores full
  * page-derived rows); chunking is the corresponding large-document
  * preparation pass a training-data pipeline adds on top.
  *
  * Scale shape: pure scan-stage — `regexp_extract_all` tokenize,
  * `sequence` window starts, `posexplode` + `slice` — no shuffle, no
  * UDF. At 100 TB this is a map-only pass whose output partitioning
  * inherits the input's, so a downstream per-chunk embed/dedup stage
  * starts from co-located chunks of the same document. Output volume
  * is input × (1 + overlap/(chunkTokens−overlap)) — the only dial
  * that matters; the oracle pins the window algebra bit-for-bit.
  *
  * Windows start every `stride = chunkTokens − overlap` tokens; the
  * final window may be shorter than `chunkTokens` (never empty);
  * documents with no tokens emit no chunks.
  */
object Chunking {

  /** Chunk `df` into (idCol, chunk_idx, start_tok, n_chunk_tokens,
    * chunk_text) rows. `chunk_idx` is 0-based and dense per document;
    * `start_tok = chunk_idx · stride` is the 0-based token offset of
    * the window. Tokenization is whitespace runs (`\S+`), matching
    * [[graft.functions.TextFunctions.tokenCount]].
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = col("__toks")
    val starts = when(size(toks) > 0,
      sequence(lit(0), size(toks) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__toks"))
      .select(col(idCol), toks,
        posexplode(starts).as(Seq("chunk_idx", "start_tok")))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        size(slice(toks, col("start_tok") + 1, lit(chunkTokens)))
          .as("n_chunk_tokens"),
        array_join(slice(toks, col("start_tok") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.TextFunctions

/** Word-level tokenization and n-gram shingling as pure column
  * expressions (codegen'd; no UDFs, no shuffle — shingling is embarrassingly
  * parallel and stays inside the scan stage at any scale).
  */
object Shingling {

  /** Normalized word tokens (lowercase, whitespace-split, empties out). */
  def tokens(text: Column): Column =
    filter(split(TextFunctions.normalized(text), " "), t => length(t) > 0)

  /** Distinct word n-gram shingles from a MATERIALIZED token-array
    * column. `toks` must be a column reference (not an inline
    * expression): every `element_at` in the transform lambda evaluates
    * its child per gram, so an inlined tokenizer would re-tokenize the
    * whole document once per gram — measured as the dominant cost of the
    * entire dedup suite before hoisting. Use [[shingleFrame]] unless you
    * already hold a token column.
    *
    * Documents with fewer than n tokens contribute their whole joined
    * token text as a single shingle (short-doc fallback so they still
    * participate in dedup).
    */
  def nGramsFromTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(grams))
  }

  /** Convenience single-expression form — fine for tests and one-off
    * columns; hot paths must go through [[shingleFrame]] (see
    * [[nGramsFromTokens]] for why).
    */
  def wordNGrams(text: Column, n: Int): Column =
    nGramsFromTokens(tokens(text), n)

  /** The standard head of every shingle-based operator: parallelized
    * (id, sh) frame with the token array materialized between the two
    * projections so shingling is O(tokens), not O(tokens·grams).
    */
  def shingleFrame(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Partitioning.forCompute(docs)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), nGramsFromTokens(col("__toks"), n).as("sh"))

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Word-level tokenization and n-gram shingling as pure column
  * expressions (codegen'd; no UDFs, no shuffle — shingling is embarrassingly
  * parallel and stays inside the scan stage at any scale).
  */
object Shingling {

  /** Normalized word tokens (lowercase, whitespace-split, empties out). */
  def tokens(text: Column): Column =
    filter(split(TextFunctions.normalized(text), " "), t => length(t) > 0)

  /** Distinct word n-gram shingles. Documents with fewer than n tokens
    * contribute their whole normalized text as a single shingle (standard
    * short-doc fallback so they still participate in dedup).
    */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(grams))
  }

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }
}

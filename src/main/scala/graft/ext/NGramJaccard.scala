package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard all-pairs similarity via shingle-inverted-index
  * blocking: explode distinct shingles, equi-join on the shingle, count
  * co-occurrences, combine with set sizes.
  *
  * This is the exact counterpart to [[MinHashDedup]] — O(Σ bucket²)
  * instead of signature-bounded, so it is the right tool when (a) the
  * shingle document-frequency distribution is tame or (b) an exact
  * answer is required (e.g. auditing MinHash recall). The `maxDf` knob
  * drops ultra-common shingles (stopword n-grams) before the join —
  * the standard skew guard: a shingle appearing in f docs contributes
  * f² join rows.
  */
object NGramJaccard {

  /** All pairs with exact Jaccard ≥ threshold over word n-gram shingles.
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * @param maxDf drop shingles appearing in more than this many docs
    *              (0 = keep all; exact results require keeping all, but
    *              a dropped shingle can only *lower* measured overlap,
    *              so with threshold filtering maxDf trades recall at the
    *              margin for skew safety).
    */
  def allPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDf: Long = 0L): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), Shingling.wordNGrams(col(textCol), n).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    val tok0 = sh.select(col("id"), explode(col("sh")).as("s"))
    val tok =
      if (maxDf > 0) {
        val hot = tok0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("s"))
        tok0.join(broadcast(hot), Seq("s"), "left_anti")
      } else tok0
    val inter = tok.as("a")
      .join(tok.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}

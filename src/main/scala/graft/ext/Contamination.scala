package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share verbatim passages with an evaluation set — the standard
  * pre-training hygiene pass against test-set leakage.
  *
  * Detection is winnowing-fingerprint containment ([[Winnowing]]): a
  * corpus doc is flagged when it shares ≥ minShared fingerprints with
  * any eval doc, which catches any common passage of ≥ roughly
  * minShared windows regardless of position or surrounding edits —
  * exactly the "the eval question was quoted inside a crawl page" shape
  * that whole-document similarity (Jaccard/SimHash) misses when the
  * page is long.
  *
  * Scale shape: eval sets are small (thousands of docs) against a huge
  * corpus — the join is an inverted-index equi-join keyed by
  * fingerprint where the eval side is broadcast-sized; the corpus side
  * is the one scan + per-row fingerprint projection. Nothing pairwise
  * in the corpus.
  */
object Contamination {

  /** Flagged (corpus_id, eval_id, n_shared) pairs with n_shared ≥
    * minShared common fingerprints.
    */
  def flagged(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 10,
      minShared: Int = 2,
      hash: Column => Column = md5): DataFrame =
    flaggedManaged(corpus, evalDocs, idCol, textCol, k, w, minShared, hash)._1

  /** [[flagged]] plus a release handle for the two internal fingerprint
    * caches — a per-training-round decontamination loop must release
    * after materializing or cached corpus-sized frames accumulate (the
    * same lifetime contract as
    * [[MinHashDedup.incrementalNearDuplicatesManaged]]).
    */
  def flaggedManaged(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 10,
      minShared: Int = 2,
      hash: Column => Column = md5): (DataFrame, () => Unit) = {
    val (cf0, releaseC) =
      Winnowing.fingerprintsManaged(corpus, idCol, textCol, k, w, hash)
    val (ef0, releaseE) =
      Winnowing.fingerprintsManaged(evalDocs, idCol, textCol, k, w, hash)
    val cf = cf0.select(col("id").as("corpus_id"), col("fp"))
    val ef = ef0.select(col("id").as("eval_id"), col("fp"))
    val out = cf.join(broadcast(ef), "fp")
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    (out, () => { releaseC(); releaseE(); () })
  }

  /** Corpus minus every flagged document (any eval overlap drops it).
    * One-shot callers only — loops must use [[decontaminateManaged]].
    */
  def decontaminate(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 10,
      minShared: Int = 2,
      hash: Column => Column = md5): DataFrame =
    decontaminateManaged(
      corpus, evalDocs, idCol, textCol, k, w, minShared, hash)._1

  /** [[decontaminate]] plus the cache release handle — a per-training-
    * round loop must call it after materializing the clean corpus (the
    * result is lazy, so release cannot happen internally).
    */
  def decontaminateManaged(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 20,
      w: Int = 10,
      minShared: Int = 2,
      hash: Column => Column = md5): (DataFrame, () => Unit) = {
    val (fl, release) =
      flaggedManaged(corpus, evalDocs, idCol, textCol, k, w, minShared, hash)
    val bad = fl.select(col("corpus_id").as(idCol)).distinct()
    (corpus.join(bad, Seq(idCol), "left_anti"), release)
  }
}

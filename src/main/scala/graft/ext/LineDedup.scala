package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Partitioning

/** Line-level corpus deduplication — the CCNet/RefinedWeb boilerplate
  * pass (Wenzek et al., "CCNet", LREC 2020 §4.1; Penedo et al.,
  * "RefinedWeb", 2023 §3.2): a LINE that recurs across many documents
  * (navigation chrome, cookie banners, license footers) is boilerplate
  * and is dropped from every document it appears in, while the
  * documents themselves survive. Complements the document-level
  * [[MinHashDedup]]: that removes whole near-duplicate docs, this
  * removes the shared junk INSIDE otherwise-distinct docs.
  *
  * Semantics:
  *  - a "line" is a `\n`-separated segment (empty trailing segments
  *    preserved, matching SQL `string_split`);
  *  - blank lines (trim = "") are structural, never counted and never
  *    removed;
  *  - document frequency is COUNT(DISTINCT doc): a line repeated five
  *    times inside one document has df = 1 and is kept — within-doc
  *    repetition is [[RepetitionStats]]' signal, not boilerplate;
  *  - every copy of a line with df ≥ `minDf` is dropped, surviving
  *    lines keep their original relative order, and a fully-emptied
  *    document yields `""` (it stays in the corpus — dropping it is a
  *    separate quality-filter decision).
  *
  * Plan shape (all key-partitioned, no driver state): posexplode is a
  * scan-stage projection; df is a two-level hash agg on
  * (line, doc) → (line); the boilerplate set (df ≥ minDf only — a
  * small fraction of distinct lines) feeds a LEFT ANTI equi-join on
  * the line key; reassembly is one hash agg on doc with an in-group
  * `array_sort` on the carried ordinal (deterministic — no
  * collect_list-order dependence). CCNet keys this pass on line
  * HASHES to shrink the shuffle; we carry exact strings so the result
  * is replayable in portable SQL — swapping the join key for
  * `xxhash64(line)` is a width optimization only, identical shape.
  */
object LineDedup {

  /** Per input doc: `doc_id`, `text_clean` (boilerplate lines removed,
    * order preserved), `n_lines` (original), `n_removed`.
    */
  def removeDuplicatedLines(
      docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val base = Partitioning.forCompute(docs)
      .select(col(idCol).as("doc_id"),
        split(col(textCol), "\n", -1).as("__lines"))
    val lines = base.select(col("doc_id"),
      posexplode(col("__lines")).as(Seq("ord", "line")))
    val boilerplate = lines
      .filter(trim(col("line")) =!= "")
      .select(col("line"), col("doc_id")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("line"))
    val kept = lines.join(boilerplate, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("__n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("ord"), col("line")))),
          x => x.getField("line")),
        "\n").as("text_clean"))
    base.select(col("doc_id"), size(col("__lines")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"))
  }
}

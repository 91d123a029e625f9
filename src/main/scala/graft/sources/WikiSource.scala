package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wikipedia dump SOURCE — turns `pages-articles*.xml.bz2` archives
  * into a documents-shaped DataFrame, the front door for the most
  * common open-corpus seed. Built on the same `binaryFile`
  * one-archive-per-task pattern as [[WarcSource]]: each task inflates
  * its archive through [[graft.functions.Bzip2Codec]] (multistream —
  * the real dump layout — handled), walks pages with
  * [[graft.functions.WikiDump]], and emits one row per page with both
  * the raw wikitext and the conservative [[graft.functions.WikiDump.stripMarkup]]
  * plain text, ready for the corpus pipeline
  * ([[graft.jobs.CorpusJobs.buildTrainingSet]] takes it as-is after a
  * column rename).
  *
  * Scale shape: Wikipedia's own multistream dumps are split into
  * ~100-page streams precisely so readers can parallelize; here the
  * parallel unit is one FILE (dumps ship as many part files), which
  * matches how the foundation publishes them. Redirect pages carry
  * their target and empty text — filter on `redirect IS NULL` for
  * content-only corpora.
  */
object WikiSource {

  /** All pages of every `.xml.bz2` dump under `glob`. */
  def pages(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        graft.functions.WikiDump.pagesFromBzip2(bytes)
          .getOrElse(Vector.empty)
          .map { p =>
            (path, p.title, p.ns, p.pageId, p.redirect, p.text,
              graft.functions.WikiDump.stripMarkup(p.text))
          }
      }
      .toDF("source_file", "title", "ns", "page_id", "redirect",
        "wikitext", "text")
  }

  /** Content pages only (main namespace, not a redirect) in the
    * documents shape the corpus pipeline expects.
    */
  def documents(spark: SparkSession, glob: String): DataFrame =
    pages(spark, glob)
      .filter(col("ns") === 0 && col("redirect").isNull)
      .select(col("page_id").as("doc_id"), col("title"),
        col("text"), lit("wikipedia").as("source"))
}

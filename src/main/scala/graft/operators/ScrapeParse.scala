package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Schemas
import graft.functions.JsonExtract

/** Scrape-payload parsing operators (SURVEY §2.1 S5/S6, §2.8 F6-F11):
  * the reference's BeautifulSoup/regex/JSON plumbing re-expressed as
  * declarative column pipelines over pre-fetched page text. Fetching
  * itself is a connector concern (rate limits, UA rotation — T5); the
  * engine operates on landed `(key, payload)` frames.
  */
object ScrapeParse {

  /** F6: distinct property ids from `/properties/<digits>` hrefs in raw
    * HTML (`pull_new_sales_list.py:132-134`). Input: (keyCol, htmlCol).
    * Output: keyCol, property_id — exploded + deduped per key.
    */
  def propertyIds(pages: DataFrame, keyCol: String, htmlCol: String): DataFrame =
    pages
      .select(col(keyCol),
        explode(regexp_extract_all(col(htmlCol), lit("/properties/(\\d+)"), lit(1)))
          .as("property_id"))
      .dropDuplicates(keyCol, "property_id")

  /** DOM-tree property-id extraction — the reference's ACTUAL selector
    * walk (`pull_new_sales_list.py:123-137`), which [[propertyIds]]'s
    * whole-page regex only approximates: for each `div` whose class
    * contains "l-searchResult", take its `a.propertyCard-link` (falling
    * back to the card's first `a[href]`), normalize the href, and keep
    * `/properties/(\d+)`. The containment scoping is the point — ids in
    * footers, comments, or script blobs are NOT listings; the regex
    * path reports them, this path cannot (divergence spec-pinned in
    * HtmlDomSpec). Runs [[graft.functions.HtmlDom]] inside a typed
    * per-partition map — a scan-stage row transform, no shuffle.
    */
  def propertyIdsDom(pages: DataFrame, keyCol: String, htmlCol: String,
      host: String = "https://www.rightmove.co.uk"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val idRe = java.util.regex.Pattern.compile("/properties/(\\d+)")
    pages.select(col(keyCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (key, html) =>
        val root = graft.functions.HtmlDom.parse(html)
        root.findAll("div", graft.functions.HtmlDom.classContains("l-searchResult"))
          .flatMap { card =>
            card.find("a", graft.functions.HtmlDom.classContains("propertyCard-link"))
              .orElse(card.find("a", graft.functions.HtmlDom.hasAttr("href")))
              .flatMap(_.attr("href")).filter(_.nonEmpty)
              .flatMap { href =>
                val full = if (href.startsWith("http")) href else host + href
                val m = idRe.matcher(full)
                if (m.find()) Some((key, m.group(1))) else None
              }
          }
      }
      .toDF(keyCol, "property_id")
      .dropDuplicates(keyCol, "property_id")
  }

  /** F7: URL normalization — prefix relative hrefs with the host
    * (`pull_new_sales_list.py:131`).
    */
  def normalizeUrl(href: org.apache.spark.sql.Column, host: String): org.apache.spark.sql.Column =
    when(href.startsWith("http"), href).otherwise(concat(lit(host), href))

  /** F8+F9: the `window.jsonModel` blob and its pagination.next field
    * (`pull_new_sales_list.py:139-157`).
    */
  def jsonModel(pages: DataFrame, htmlCol: String,
      marker: String = "window.jsonModel"): DataFrame =
    pages
      .withColumn("json_model", JsonExtract.balancedJson(col(htmlCol), marker))
      .withColumn("pagination_next",
        get_json_object(col("json_model"), "$.pagination.next"))

  /** O3: pagination-chain traversal over landed pages
    * (`pull_new_sales_list.py:152-157, 200-206`): starting from
    * `startUrl`, follow each page's `pagination.next` link until the
    * chain ends, a page is missing, a cycle repeats, or `maxPages` is
    * hit (the reference's hard cap, 200). Output: (page_idx, url,
    * json_model) in chain order.
    *
    * Chain-walking is inherently sequential, so this is a driver-side
    * loop of at most `maxPages` lookups — each one a pushed-down
    * key-equality filter on the landed frame (cheap at any corpus
    * size), exactly the reference's fetch loop with the network hop
    * replaced by a keyed scan. Caching the (url → next) projection
    * keeps repeated lookups off the raw HTML.
    */
  def paginationChain(
      pages: DataFrame,
      urlCol: String,
      htmlCol: String,
      startUrl: String,
      maxPages: Int = 200): DataFrame = {
    import pages.sparkSession.implicits._
    val modeled = jsonModel(pages.select(col(urlCol).as("url"), col(htmlCol)), htmlCol)
      .select(col("url"), col("json_model"), col("pagination_next"))
      .cache()
    val visited = scala.collection.mutable.LinkedHashMap[String, String]()
    var current = Option(startUrl)
    while (current.isDefined && !visited.contains(current.get)
        && visited.size < maxPages) {
      val url = current.get
      modeled.filter(col("url") === url)
        .select(col("json_model"), col("pagination_next"))
        .limit(1).collect().headOption match {
        case Some(row) =>
          visited.put(url, row.getString(0))
          current = Option(row.getString(1)).filter(_.nonEmpty)
        case None =>
          current = None // dangling next: stop at the last landed page
      }
    }
    modeled.unpersist()
    visited.toSeq.zipWithIndex
      .map { case ((url, model), i) => (i, url, model) }
      .toDF("page_idx", "url", "json_model")
  }

  /** F10/F11 + P7: typeahead payload → first OUTCODE match per key
    * (`rightmove_outcodes.py:103-120`): parse `matches`, keep
    * type=OUTCODE, first by array position, lenient id cast.
    */
  def firstOutcodeMatch(payloads: DataFrame, keyCol: String, jsonCol: String): DataFrame = {
    val parsed = payloads
      .select(col(keyCol),
        posexplode_outer(
          from_json(col(jsonCol), Schemas.typeaheadPayload).getField("matches"))
          .as(Seq("pos", "m")))
      .filter(col("m.type") === "OUTCODE")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("pos"))
    parsed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol),
        expr("try_cast(m.id AS long)").as("area_id"),
        col("m.displayName").as("display_name"))
  }
}

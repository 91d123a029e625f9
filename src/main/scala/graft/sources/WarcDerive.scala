package graft.sources

import org.apache.spark.sql.Dataset

import graft.ext.LinkGraph
import graft.functions.{CharsetDetect, HtmlDom, WarcCodec}

/** WET / WAT derivation — the two companion artifacts every public
  * crawl distribution ships next to its raw WARCs (Common Crawl's
  * layout): WET carries the extracted plain text of each fetched page
  * as `conversion` records, WAT carries per-response metadata (title,
  * outlinks, HTTP envelope) as `metadata` records with a JSON block.
  * Reference scope: the reference repo stops at scraping single pages
  * (`pull_new_sales_list.py`); this tier is the forward-looking
  * corpus-distribution shape a 100 TB pipeline publishes.
  *
  * Scale contract: both derivations are pure scan stages over the
  * response rows — per-record charset sniff, DOM parse, text walk and
  * link resolution, no cross-record state, no shuffle (PlanQualitySpec
  * pins q167 Exchange-free). At 100 TB this runs as one map over the
  * per-archive WARC tasks and writes WET/WAT archives file-parallel.
  */
object WarcDerive {

  /** One WET `conversion` row: the page's visible text. */
  final case class WetRow(
      warc_file: String,
      refers_to: String,
      target_uri: String,
      warc_date: String,
      charset: String,
      text: String,
      text_len: Long)

  /** One WAT `metadata` row: the response envelope + HTML metadata. */
  final case class WatRow(
      warc_file: String,
      refers_to: String,
      target_uri: String,
      warc_date: String,
      http_status: Option[Int],
      http_content_type: Option[String],
      title: Option[String],
      n_links: Long,
      links: Seq[String],
      meta_json: String)

  private val droppedTags = Set("script", "style", "noscript", "template")

  /** Visible text of a page: charset-decoded, DOM-parsed, script/style/
    * noscript/template subtrees dropped, remaining text whitespace-
    * normalized (runs → single space, trimmed) — document order, the
    * WET extraction rule. Non-HTML payloads pass through as decoded,
    * normalized text.
    */
  def pageText(html: String): String = {
    val root = HtmlDom.parse(html)
    val sb = new StringBuilder
    def walk(n: HtmlDom.Node): Unit = n match {
      case HtmlDom.Text(s) => sb.append(s).append(' '); ()
      case e: HtmlDom.Elem =>
        if (!droppedTags.contains(e.tag)) e.children.foreach(walk)
    }
    root.children.foreach(walk)
    sb.toString.trim.replaceAll("\\s+", " ")
  }

  private def isHtml(r: WarcSource.WarcRow): Boolean =
    r.http_content_type.exists(_.toLowerCase.startsWith("text/html"))

  /** WET of ONE response record (the per-row kernel [[wet]] maps). */
  def wetOf(r: WarcSource.WarcRow): WetRow = {
    val d = CharsetDetect.decode(r.payload, r.http_content_type)
    val text =
      if (isHtml(r)) pageText(d.text)
      else d.text.trim.replaceAll("\\s+", " ")
    WetRow(r.warc_file, r.record_id, r.target_uri, r.warc_date,
      d.charset, text, text.length.toLong)
  }

  /** WET derivation over `response` rows (run [[WarcSource.responses]]
    * first). Pure per-row work — stays in the archive's scan stage.
    */
  def wet(responses: Dataset[WarcSource.WarcRow]): Dataset[WetRow] = {
    import responses.sparkSession.implicits._
    responses.mapPartitions(_.map(wetOf))
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** WAT of ONE response record: title, resolved outlinks, and a
    * compact JSON envelope (uri/status/content_type/title/n_links —
    * the hash-gated subset of Common Crawl's WAT `Envelope`).
    */
  def watOf(r: WarcSource.WarcRow): WatRow = {
    val d = CharsetDetect.decode(r.payload, r.http_content_type)
    val (title, links) =
      if (isHtml(r)) {
        val root = HtmlDom.parse(d.text)
        val t = root.find("title").map(_.text.trim.replaceAll("\\s+", " "))
          .filter(_.nonEmpty)
        (t, LinkGraph.links(r.target_uri, d.text).map(_.dst_url))
      } else (None, Nil)
    val json = new StringBuilder()
      .append("{\"uri\":\"").append(jsonEscape(r.target_uri)).append('"')
      .append(",\"status\":").append(r.http_status.getOrElse(0))
      .append(",\"content_type\":\"")
      .append(jsonEscape(r.http_content_type.getOrElse(""))).append('"')
      .append(title.fold("")(t => ",\"title\":\"" + jsonEscape(t) + "\""))
      .append(",\"n_links\":").append(links.length)
      .append('}').toString
    WatRow(r.warc_file, r.record_id, r.target_uri, r.warc_date,
      r.http_status, r.http_content_type, title, links.length.toLong,
      links, json)
  }

  /** WAT derivation over `response` rows. Pure per-row work. */
  def wat(responses: Dataset[WarcSource.WarcRow]): Dataset[WatRow] = {
    import responses.sparkSession.implicits._
    responses.mapPartitions(_.map(watOf))
  }

  /** Serialize WET rows back into a WARC archive of `conversion`
    * records (`WARC-Refers-To` linking each to its source response) —
    * the publishable `.warc.wet(.gz)` shape.
    */
  def wetFile(rows: Seq[WetRow], gzip: Boolean): Array[Byte] = {
    val recs = rows.zipWithIndex.map { case (r, i) =>
      WarcCodec.record("conversion", s"<urn:uuid:wet-$i>",
        Some(r.target_uri), r.warc_date,
        "text/plain",
        r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        extraHeaders = Seq("WARC-Refers-To" -> r.refers_to))
    }
    WarcCodec.file(recs, gzip)
  }

  /** Serialize WAT rows as `metadata` records carrying the JSON block. */
  def watFile(rows: Seq[WatRow], gzip: Boolean): Array[Byte] = {
    val recs = rows.zipWithIndex.map { case (r, i) =>
      WarcCodec.record("metadata", s"<urn:uuid:wat-$i>",
        Some(r.target_uri), r.warc_date,
        "application/json",
        r.meta_json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        extraHeaders = Seq("WARC-Refers-To" -> r.refers_to))
    }
    WarcCodec.file(recs, gzip)
  }
}

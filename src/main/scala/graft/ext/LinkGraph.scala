package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.HtmlDom

/** Hyperlink extraction — fetched pages to a link graph, feeding the
  * existing graph tier (host-level [[PageRank]]/[[TrustRank]] for
  * quality priors; [[ConnectedComponents]] for mirror clusters).
  *
  * Per page: DOM-walk `<a href>` anchors ([[HtmlDom]], so links inside
  * script blobs or comments never count), resolve each href against
  * the page URL with the RFC 3986 merge (absolute, protocol-relative,
  * path-absolute, relative with dot-segment removal), carry the
  * anchor text and the `rel=nofollow` flag; `javascript:`/`mailto:`/
  * fragment-only pseudo-links drop. Scan-stage per-row work; the host
  * graph is one (src,dst) aggregate on top.
  */
object LinkGraph {

  final case class Link(src_url: String, dst_url: String,
      anchor: String, nofollow: Boolean)

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):".r
  private val BaseRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)".r

  /** Resolve `href` against an absolute `base` page URL; None for
    * pseudo-links and unresolvable cases.
    */
  def resolve(base: String, href: String): Option[String] = {
    val h = href.trim
    if (h.isEmpty || h.startsWith("#")) return None
    SchemeRe.findFirstMatchIn(h) match {
      case Some(m) =>
        val scheme = m.group(1).toLowerCase
        if (scheme == "http" || scheme == "https") Some(h)
        else None // javascript:, mailto:, tel:, data:, ftp:, …
      case None =>
        BaseRe.findFirstMatchIn(base) match {
          case None => None
          case Some(b) =>
            val scheme = b.group(1)
            val host = b.group(2)
            val basePath = if (b.group(3).isEmpty) "/" else b.group(3)
            if (h.startsWith("//")) Some(scheme + ":" + h)
            else if (h.startsWith("/")) Some(s"$scheme://$host" + removeDotSegments(h))
            else {
              // RFC 3986 §5.3 merge: replace everything after the last '/'
              val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
              Some(s"$scheme://$host" + removeDotSegments(dir + h))
            }
        }
    }
  }

  /** RFC 3986 §5.2.4 dot-segment removal over an absolute path. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    path.split("/").foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) { out.remove(out.length - 1); () }
      case seg => out += seg
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }

  /** All resolved links of one page. */
  def links(pageUrl: String, html: String): Seq[Link] = {
    val root = HtmlDom.parse(html)
    root.findAll("a", HtmlDom.hasAttr("href")).flatMap { a =>
      resolve(pageUrl, a.attrs("href")).map { dst =>
        Link(pageUrl, dst,
          a.text.trim.replaceAll("\\s+", " "),
          a.attrs.get("rel").exists(_.toLowerCase.split("[\\s,]+").contains("nofollow")))
      }
    }
  }

  /** Page-level edge extraction over a (url, html) frame. */
  def edges(pages: DataFrame, urlCol: String, htmlCol: String): Dataset[Link] = {
    import pages.sparkSession.implicits._
    pages.select(col(urlCol).cast("string"), col(htmlCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (u, h) => links(u, h) }
  }

  /** Host-level graph: (src_host, dst_host, n_links, n_follow) — the
    * input shape of the PageRank/TrustRank tier. One aggregate
    * shuffle; self-loops dropped (they carry no endorsement signal).
    */
  def hostGraph(linkRows: Dataset[Link]): DataFrame = {
    import graft.functions.UrlFunctions
    linkRows.toDF()
      .withColumn("src_host", UrlFunctions.host(col("src_url")))
      .withColumn("dst_host", UrlFunctions.host(col("dst_url")))
      .where(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"),
        sum(when(!col("nofollow"), 1L).otherwise(0L)).as("n_follow"))
  }
}

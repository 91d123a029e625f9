package graft.functions

/** Sitemap parsing (sitemaps.org XML protocol) — the crawl frontier's
  * seed source, completing the polite-ingest chain robots → sitemap →
  * frontier shard ([[RobotsRules]], [[UrlFunctions]]). Parsed with the
  * lenient [[HtmlDom]] tree (XML prolog and namespaces pass through as
  * inert text/attrs), so real-world malformed sitemaps degrade to
  * whatever was recoverable instead of throwing. Scan-stage per-row
  * work, O(bytes), the codec-tier shape.
  */
object Sitemap {

  /** One `<url>` entry of a urlset. */
  final case class Entry(
      loc: String,
      lastmod: Option[String],
      changefreq: Option[String],
      priority: Option[Double])

  private def childText(e: HtmlDom.Elem, tag: String): Option[String] =
    e.find(tag).map(_.text.trim).filter(_.nonEmpty)

  /** `<urlset>` entries; entries without a `<loc>` are dropped (the
    * protocol makes loc mandatory).
    */
  def parse(xml: String): Seq[Entry] = {
    val root = HtmlDom.parse(xml)
    root.findAll("url").flatMap { u =>
      childText(u, "loc").map { loc =>
        Entry(loc,
          childText(u, "lastmod"),
          childText(u, "changefreq"),
          childText(u, "priority").flatMap(p =>
            try Some(p.toDouble) catch { case _: NumberFormatException => None }))
      }
    }
  }

  /** `<sitemapindex>` child sitemap locations (the recursion seam — the
    * caller fetches and re-parses; at crawl scale that fan-out is a
    * frontier job, not a nested loop here).
    */
  def indexLocs(xml: String): Seq[String] = {
    val root = HtmlDom.parse(xml)
    root.findAll("sitemap").flatMap(childText(_, "loc"))
  }
}

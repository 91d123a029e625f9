package graft.functions

import HtmlDom.{Elem, Node, Text}

/** Main-content extraction (boilerplate removal) — the step between
  * "fetched page" and every downstream text operator (language-ID,
  * quality, dedup): crawl HTML is mostly chrome, and training on nav
  * bars is the classic corpus failure.
  *
  * The heuristic is the published extraction lineage (Arc90
  * Readability's container scoring; Kohlschütter et al., WSDM 2010
  * boilerpipe's text-vs-link-density signal), re-derived over
  * [[HtmlDom]]'s tree — no code from either:
  *
  *  1. PRUNE structural chrome: non-content tags (script/style/nav/
  *     header/footer/aside/form…) and any element whose class/id
  *     carries a boilerplate marker word (sidebar, comment, share, ad,
  *     banner, cookie…).
  *  2. SCORE every remaining element that has direct `<p>` children:
  *     a paragraph contributes its normalized text length minus twice
  *     its link-anchored characters (clamped at 0) — link-dense
  *     "related articles" blocks self-erase; the candidate's score is
  *     the sum over its direct paragraphs.
  *  3. The best-scoring container (document order breaks ties) yields
  *     the extraction: its direct paragraphs' texts, each
  *     whitespace-normalized, non-empty ones joined with `\n`. A page
  *     with no scoring container at all falls back to the pruned
  *     tree's whole normalized text — better a noisy document than a
  *     silently empty one.
  *
  * Determinism: integer arithmetic, document order, no randomness —
  * the same bytes extract identically on any executor, so retries and
  * AQE re-plans cannot flip a row (the house sampling contract).
  * Scale shape: O(bytes) per document inside a per-partition map —
  * a pure scan-stage row transform like the codec tier.
  */
object MainContent {

  /** Tags that never hold main content (WHATWG sectioning/chrome + the
    * non-content embedded set).
    */
  private val DropTags = Set(
    "script", "style", "noscript", "svg", "form", "nav", "header",
    "footer", "aside", "iframe", "button", "select", "option", "textarea")

  /** Boilerplate marker words matched as '-'/'_'-delimited tokens of
    * class/id attributes (marker "ad" must hit "ad-box", not "shadow").
    */
  private val BoilerMarkers = Set(
    "nav", "navbar", "menu", "footer", "header", "sidebar", "side",
    "comment", "comments", "share", "social", "ad", "ads", "advert",
    "advertisement", "banner", "cookie", "breadcrumb", "breadcrumbs",
    "promo", "related", "widget", "popup", "modal")

  private def isBoiler(e: Elem): Boolean = {
    val marker = e.attrs.getOrElse("class", "") + " " + e.attrs.getOrElse("id", "")
    marker.toLowerCase.split("[^a-z0-9]+").exists(BoilerMarkers)
  }

  /** Drop chrome subtrees wholesale (a pruned container's text must not
    * leak through a child).
    */
  private def prune(e: Elem): Elem =
    Elem(e.tag, e.attrs, e.children.flatMap {
      case c: Elem if DropTags(c.tag) || isBoiler(c) => None
      case c: Elem => Some(prune(c))
      case t => Some(t)
    })

  private def norm(s: String): String = s.trim.replaceAll("\\s+", " ")

  /** Paragraph contribution: normalized length minus twice the
    * link-anchored characters, clamped at 0.
    */
  private def pScore(p: Elem): Int = {
    val total = norm(p.text).length
    val links = p.findAll("a").map(a => norm(a.text).length).sum
    math.max(0, total - 2 * links)
  }

  private def directParagraphs(e: Elem): Vector[Elem] =
    e.children.collect { case c: Elem if c.tag == "p" => c }.toVector

  /** Extract the main text of an HTML page. Total: malformed input
    * yields whatever the lenient parser recovered, never a throw.
    */
  def extract(html: String): String = {
    val cleaned = prune(HtmlDom.parse(html))
    val candidates = (Iterator.single(cleaned) ++ cleaned.descendants)
      .map(e => (e, directParagraphs(e)))
      .filter(_._2.nonEmpty)
      .map { case (e, ps) => (e, ps, ps.map(pScore).sum) }
      .toVector
    val best = candidates.filter(_._3 > 0) match {
      case Vector() => None
      case cs => Some(cs.maxBy(_._3)) // maxBy keeps the FIRST max: document order breaks ties
    }
    best match {
      case Some((_, ps, _)) =>
        ps.map(p => norm(p.text)).filter(_.nonEmpty).mkString("\n")
      case None => norm(cleaned.text)
    }
  }
}

package graft.functions

/** Robots Exclusion Protocol (RFC 9309) — the admission check a
  * polite crawl pipeline runs before any fetch, and the natural
  * companion of the [[graft.operators.Fetcher]]/[[WarcCodec]] ingest
  * seam. Implemented from the published RFC, no crawler code consulted:
  *
  *  - groups: consecutive `User-agent:` lines share the following
  *    rule block; group selection is case-insensitive product-token
  *    match, most-specific (longest) agent token wins, `*` is the
  *    fallback group; no applicable group means everything is allowed.
  *  - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *    and the `$` end anchor; the matching rule with the LONGEST
  *    pattern takes precedence, Allow winning exact ties; an empty
  *    pattern is a no-op rule; no matching rule allows.
  *  - `Crawl-delay` (the de-facto extension) is surfaced per group for
  *    the rate-limit tier ([[graft.operators.Fetcher]]'s token bucket).
  *
  * Pure string → decision; runs scan-stage inside per-partition maps
  * like every other codec, O(rules) per probe.
  */
object RobotsRules {

  final case class Group(agents: Vector[String],
      rules: Vector[Rule], crawlDelay: Option[Double])

  /** allow=true for `Allow:`; `pattern` is the raw path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  final case class Robots(groups: Vector[Group],
      sitemaps: Vector[String] = Vector.empty) {

    /** The group governing `agent`, per RFC precedence. */
    def groupFor(agent: String): Option[Group] = {
      val a = agent.toLowerCase
      val named = groups.iterator.flatMap { g =>
        g.agents.collect { case t if t != "*" && a.contains(t.toLowerCase) => (t.length, g) }
      }.toVector
      if (named.nonEmpty) Some(named.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    }

    /** RFC rule precedence: longest matching pattern wins; Allow wins
      * length ties; nothing matching (or no group) allows.
      */
    def allows(agent: String, path: String): Boolean =
      groupFor(agent) match {
        case None => true
        case Some(g) =>
          val hits = g.rules.filter(r => r.pattern.nonEmpty && matches(r.pattern, path))
          if (hits.isEmpty) true
          else {
            val maxLen = hits.map(_.pattern.length).max
            hits.filter(_.pattern.length == maxLen).exists(_.allow)
          }
      }

    def crawlDelay(agent: String): Option[Double] =
      groupFor(agent).flatMap(_.crawlDelay)
  }

  /** Parse a robots.txt body. Lenient: unknown directives are skipped,
    * rules before any User-agent line are ignored, `#` starts a
    * comment. Never throws.
    */
  def parse(txt: String): Robots = {
    val groups = Vector.newBuilder[Group]
    val sitemaps = Vector.newBuilder[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = false // consecutive User-agent lines accumulate
    var open = false

    def flush(): Unit = {
      if (open) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None; open = false
    }

    val lines = if (txt == null) Array.empty[String] else txt.split("\r\n|\n|\r", -1)
    lines.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) { flush(); open = true }
            agents :+= value
            inAgents = true
          case "allow" if open =>
            rules :+= Rule(allow = true, value); inAgents = false
          case "disallow" if open =>
            rules :+= Rule(allow = false, value); inAgents = false
          case "crawl-delay" if open =>
            delay = try Some(value.toDouble) catch { case _: NumberFormatException => delay }
            inAgents = false
          case "sitemap" =>
            // RFC 9309 §2.3 "other records": group-independent — valid
            // anywhere in the file, never attached to a User-agent
            if (value.nonEmpty) sitemaps += value
            inAgents = false
          case _ => inAgents = false
        }
      }
    }
    flush()
    Robots(groups.result(), sitemaps.result())
  }

  /** RFC 9309 path-pattern match: `*` spans any octets, trailing `$`
    * anchors the end; otherwise a prefix match.
    */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    // segments between '*'s must appear in order; first segment at 0
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val seg = parts(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == parts.length - 1 && anchored) {
        // last segment must END the path (at/after pos)
        return path.length - seg.length >= pos && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Page-level robots directives — the <meta name="robots"> channel
    * (and, when the caller has response headers, `X-Robots-Tag`),
    * which govern a PAGE after fetching, where robots.txt governed the
    * FETCH: `noindex` (keep out of the corpus/index), `nofollow`
    * (discard this page's outlinks), with `none` ≡ both and `all` ≡
    * neither. Token match is case-insensitive on comma-separated
    * values, multiple meta tags and header values union (the
    * restrictive reading every engine applies).
    */
  final case class PageDirectives(noindex: Boolean, nofollow: Boolean)

  def pageDirectives(html: String,
      xRobotsTag: Option[String] = None): PageDirectives = {
    val metas = HtmlDom.parse(html).findAll("meta", e =>
        e.attrs.get("name").exists(_.equalsIgnoreCase("robots")))
      .flatMap(_.attrs.get("content"))
    val tokens = (metas ++ xRobotsTag.toSeq)
      .flatMap(_.split(",")).map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSet
    val none = tokens.contains("none")
    PageDirectives(
      noindex = none || tokens.contains("noindex"),
      nofollow = none || tokens.contains("nofollow"))
  }
}

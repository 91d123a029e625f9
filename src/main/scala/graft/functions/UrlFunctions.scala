package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL structure functions for crawl-frontier operators — host
  * extraction, registrable-domain grouping, and politeness sharding.
  * All pure built-in Column expressions (regexp/string/array ops), so
  * they run inside whole-stage codegen at the scan, never a UDF.
  *
  * The scale story is the FRONTIER: a 100 TB crawl schedules fetches
  * per registrable domain (rate limits bind per site, not per URL), so
  * the partitioning key of every polite-crawl stage is
  * [[crawlShard]] — a deterministic md5-variate of the host (the house
  * cross-engine hash recipe, [[graft.ext.Sampling]]) that keeps one
  * host's URLs in one shard under any repartitioning, retry, or AQE
  * re-plan.
  */
object UrlFunctions {

  /** Lowercased host of an absolute URL: scheme, userinfo, port, path,
    * query, fragment stripped; null when no scheme-qualified host is
    * present (relative URLs have no authority to extract).
    */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Multi-label public suffixes where the registrable domain needs
    * THREE labels (the high-traffic subset of the public suffix list;
    * the full list is data, not code — swap in at deploy time).
    */
  private val MultiSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "net.br", "org.br", "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn", "co.nz", "net.nz", "org.nz",
    "com.mx", "com.ar", "com.tr", "co.za", "co.kr", "com.sg")

  /** Registrable domain (site identity for grouping/rate limiting):
    * the last two host labels, or three when the two-label tail is a
    * known multi-label public suffix. IP-literal hosts pass through
    * unchanged. Null host → null.
    */
  def registrableDomain(hostCol: Column): Column = {
    // tail-anchored regexps, not array indexing: ANSI sessions throw on
    // out-of-bounds element_at, and hosts with <3 labels are the norm
    val last2 = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val isIp = hostCol.rlike("^\\d+\\.\\d+\\.\\d+\\.\\d+$")
    when(hostCol.isNull, lit(null).cast("string"))
      .when(isIp || last2 === "", hostCol)
      .when(last2.isin(MultiSuffixes: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

  /** Politeness shard in [0, nShards): deterministic md5-variate of the
    * key (normally the registrable domain) — co-locates one site's
    * URLs under any plan. Null key → null.
    */
  def crawlShard(key: Column, nShards: Int): Column =
    when(key.isNull, lit(null).cast("long"))
      .otherwise(pmod(conv(substring(md5(key), 1, 15), 16, 10).cast("long"),
        lit(nShards.toLong)))

  /** URL path (no query/fragment); "/" when absent but a host exists. */
  def path(url: Column): Column = {
    val p = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    when(host(url).isNull, lit(null).cast("string"))
      .otherwise(when(p === "", "/").otherwise(p))
  }
}

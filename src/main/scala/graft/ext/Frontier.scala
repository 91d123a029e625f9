package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Crawl-frontier scheduling: turn a URL set into a per-shard,
  * politeness-spaced fetch plan — the step between seed discovery
  * ([[graft.functions.Sitemap]], [[graft.functions.RobotsRules]]) and
  * the fetch tier ([[graft.operators.Fetcher]]'s token bucket).
  *
  * Semantics: fetches against one registrable domain must be serial
  * and spaced by that domain's crawl delay; different domains are
  * independent. So the plan is: domain → politeness shard
  * ([[UrlFunctions.crawlShard]] — one domain never splits across
  * shards), a per-domain sequence (priority DESC, then URL for
  * determinism), and `fetch_offset_ms = (seq-1) × delay_ms` — the
  * earliest polite start relative to the domain's first fetch.
  *
  * Scale shape: ONE Exchange (the domain-keyed window); everything
  * else is scan-stage column work. Per-domain ordering is a semantic
  * serialization (politeness), so a hot domain is a *schedule*
  * bottleneck by definition, not a plan defect — the window task for
  * a domain only sorts that domain's URLs, and AQE splits oversized
  * shard partitions freely because shard is derived, not a
  * partitioning contract.
  */
object Frontier {

  /** @param urls      frame carrying `urlCol` (+ optional priority /
    *                  per-domain delay columns)
    * @param urlCol    absolute URL column
    * @param priority  numeric column expression; higher fetches first
    * @param delayMs   per-row delay-ms column expression (normally a
    *                  per-domain constant, e.g. from robots
    *                  crawl-delay); spacing uses the domain's value
    * @param nShards   politeness shard count (the fetch-tier
    *                  parallelism dial)
    */
  def schedule(urls: DataFrame, urlCol: String,
      priority: org.apache.spark.sql.Column,
      delayMs: org.apache.spark.sql.Column,
      nShards: Int): DataFrame = {
    val withKeys = urls
      .withColumn("host", UrlFunctions.host(col(urlCol)))
      .withColumn("domain", UrlFunctions.registrableDomain(col("host")))
      .withColumn("shard", UrlFunctions.crawlShard(col("domain"), nShards))
    val w = Window.partitionBy(col("domain"))
      .orderBy(priority.desc, col(urlCol).asc)
    withKeys
      .withColumn("seq", row_number().over(w))
      .withColumn("fetch_offset_ms", (col("seq") - 1).cast("long") * delayMs.cast("long"))
  }
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** crawl stack: WARC/WET-WAT/CDX, robots, frontier, sitemaps, link
  * extraction, wiki dumps and ranged splits, the corpus-pipeline
  * capstone.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtCrawlQueries {

  val queries: Map[String, Q] = Map(

    // ── WARC crawl-archive round trip (the raw-input container of a
    // web-scale corpus): per doc_id a two-record archive (warcinfo +
    // HTTP response whose entity body is the document text) is
    // serialized — odd ids as one-gzip-member-per-record .warc.gz, the
    // Common Crawl layout; even ids plain — and read back through the
    // full parser walk: member-by-member gunzip, WARC header fields,
    // Content-Length block framing, RFC 9112 status/header/body split.
    // doc_id is recovered FROM the parsed WARC-Target-URI (not carried
    // alongside), so a framing slip anywhere breaks the join to the
    // oracle; payload identity is pinned by md5 over the extracted
    // entity body vs DuckDB's md5 over the source text. id%4 rotates
    // the HTTP wire codings (Content-Encoding: gzip × Transfer-
    // Encoding: chunked), so the inflate and chunk-unwrap arms sit
    // under the same hash gate as the plain path.
    "q154_warc_extract" -> { (s, dir) =>
      import s.implicits._
      // per-row codec CPU (gzip/chunked framing both ways) over a
      // one-split table — spread before the map or it runs on one core
      val files = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val status = if (id % 3 == 0) 404 else 200
          val reason = if (status == 200) "OK" else "Not Found"
          val date = "2026-01-01T00:00:00Z"
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:info-$id>", date, Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:resp-$id>", s"https://example.org/doc/$id", date,
              status, reason, "text/html; charset=utf-8", body,
              gzipBody = id % 2 == 0, chunked = id % 4 >= 2))
          (s"doc-$id.warc", graft.functions.WarcCodec.file(recs, gzip = id % 2 == 1))
        }
      graft.sources.WarcSource.responses(graft.sources.WarcSource.fromBytes(files))
        .toDF()
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("warc_type"),
          col("target_uri"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          length(col("payload")).cast("long").as("payload_len"),
          md5(col("payload")).as("payload_md5"))
    },

    // ── robots.txt admission (RFC 9309): per doc_id a robots body with
    // a bot-specific group (prefix Disallow, longer-prefix Allow,
    // wildcard+anchored Disallow, Crawl-delay) over a deny-all "*"
    // group; five probe paths rotate through longest-match-wins, the
    // Allow tie-break, group selection (deny-all must NOT apply), the
    // $ anchor hit, and the $ anchor miss. The oracle replays the
    // decision table arithmetically.
    "q156_robots_check" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val txt =
            s"""# robots for doc $id
               |User-agent: graftbot
               |Disallow: /p$id/
               |Allow: /p$id/pub
               |Disallow: /*.pdf$$
               |Crawl-delay: ${id % 7 + 1}
               |
               |User-agent: *
               |Disallow: /
               |""".stripMargin
          val path = (id % 5) match {
            case 0 => s"/p$id/x"      // prefix Disallow hits
            case 1 => s"/p$id/pub/a"  // longer Allow overrides
            case 2 => "/other"        // no rule in the bot's group
            case 3 => "/doc.pdf"      // anchored wildcard hits
            case _ => "/doc.pdfx"     // $ anchor must miss
          }
          val robots = graft.functions.RobotsRules.parse(txt)
          (id, path, robots.allows("graftbot/1.0", path),
            robots.crawlDelay("graftbot/1.0").getOrElse(-1.0).toLong)
        }
        .toDF("doc_id", "path", "allowed", "crawl_delay")
    },

    // ── URL frontier decomposition: five URL shapes (multi-label
    // public suffix, userinfo+port, IPv4 literal, bare host, relative)
    // through host → registrable domain → politeness shard → path, all
    // pure codegen Column expressions. The shard is the md5-variate of
    // the domain (the house cross-engine hash), so the oracle
    // recomputes it bit-exactly; one host's URLs land in one shard
    // under any partitioning.
    "q157_url_frontier" -> { (s, dir) =>
      import graft.functions.UrlFunctions
      val idS = col("doc_id").cast("string")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("https://www.sub.site"), idS, lit(".co.uk/a/b?q="), idS))
        .when(col("doc_id") % 5 === 1,
          concat(lit("http://user:pw@site"), idS, lit(".example.com:8080/idx.html#frag")))
        .when(col("doc_id") % 5 === 2, concat(lit("https://10.0.0.7/p"), idS))
        .when(col("doc_id") % 5 === 3, concat(lit("https://host"), idS, lit(".com.au")))
        .otherwise(lit("/relative/only"))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .withColumn("host", UrlFunctions.host(col("url")))
        .withColumn("domain", UrlFunctions.registrableDomain(col("host")))
        .withColumn("shard", UrlFunctions.crawlShard(col("domain"), 64))
        .withColumn("path", UrlFunctions.path(col("url")))
    },

    // ── sitemap seed extraction (sitemaps.org protocol): per doc_id a
    // three-entry urlset with XML prolog, namespace attr, and per-entry
    // lastmod/changefreq/priority; parsed through the DOM walk and
    // exploded to one row per entry, each field replayed by the oracle.
    "q158_sitemap_entries" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val entries = (0 until 3).map { i =>
            val day = (id % 28 + 1).toInt
            val freq = Seq("daily", "weekly", "monthly")(((id + i) % 3).toInt)
            s"""  <url>
               |    <loc>https://s$id.example/p/$i</loc>
               |    <lastmod>2026-01-${f"$day%02d"}</lastmod>
               |    <changefreq>$freq</changefreq>
               |    <priority>0.${(id + i) % 10}</priority>
               |  </url>""".stripMargin
          }
          val xml =
            s"""<?xml version="1.0" encoding="UTF-8"?>
               |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
               |${entries.mkString("\n")}
               |</urlset>""".stripMargin
          graft.functions.Sitemap.parse(xml).map { e =>
            (id, e.loc, e.lastmod.orNull, e.changefreq.orNull,
              e.priority.getOrElse(-1.0))
          }
        }
        .toDF("doc_id", "loc", "lastmod", "changefreq", "priority")
    },

    // ── frontier schedule: URLs collapse onto 7 domains; the plan must
    // serialize each domain (row_number by priority DESC, url) and
    // space fetches by the domain's crawl delay — one domain-keyed
    // Exchange, everything else scan-stage. The oracle replays the
    // window arithmetic and the shared md5 shard.
    "q159_frontier_schedule" -> { (s, dir) =>
      import graft.ext.Frontier
      val idS = col("doc_id").cast("string")
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example/d/"), idS).as("url"),
          (col("doc_id") % 10).as("prio"),
          ((col("doc_id") % 7 + 1) * 100).as("delay_ms"))
      Frontier.schedule(urls, "url", col("prio"), col("delay_ms"), nShards = 32)
        .select(col("doc_id"), col("url"), col("domain"),
          col("shard"), col("seq").cast("long").as("seq"),
          col("fetch_offset_ms"))
    },

    // ── hyperlink extraction: per doc a page at a two-deep path with
    // six anchor arms (absolute, path-absolute, relative, ../ climb,
    // protocol-relative, rel=nofollow) plus javascript:/fragment decoys
    // that must drop; each resolved dst replayed by the oracle. DOM
    // scoping: a decoy <a> inside a <script> blob must not surface.
    "q160_link_extract" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val pageUrl = s"https://w$id.example/a/b/page.html"
          val html =
            s"""<html><head><script>var s = '<a href="https://decoy.example/x">no</a>';</script></head>
               |<body>
               |<a href="https://other$id.example/z">link0</a>
               |<a href="/r/s">link1</a>
               |<a href="c/d.html">link2</a>
               |<a href="../up.html">link3</a>
               |<a href="//cdn$id.example/lib.js">link4</a>
               |<a href="https://ref.example/p" rel="sponsored nofollow">link5</a>
               |<a href="#frag">drop me</a>
               |<a href="javascript:void(0)">drop too</a>
               |<a href="mailto:x@example.org">drop three</a>
               |</body></html>""".stripMargin
          graft.ext.LinkGraph.links(pageUrl, html).map { l =>
            (id, l.dst_url, l.anchor, l.nofollow)
          }
        }
        .toDF("doc_id", "dst_url", "anchor", "nofollow")
    },

    // ── WARC random-access index (the CDX model): per doc a 3-record
    // archive — gzip one-member-per-record for even ids, plain for odd
    // — is indexed (per-record byte extents from the gzip member walk
    // or the plain record walk), then every record is re-fetched
    // THROUGH its extent alone and compared field-for-field against
    // the sequential parse; extents must tile the archive exactly.
    // Invariant gate: all flags true, rows = documents.
    "q165_warc_cdx" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val date = "2026-01-01T00:00:00Z"
          val half = text.length / 2
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:i$id>", date, Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:a$id>", s"https://example.org/a/$id", date,
              200, "OK", "text/plain",
              text.substring(0, half).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:b$id>", s"https://example.org/b/$id", date,
              200, "OK", "text/plain",
              text.substring(half).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          val bytes = graft.functions.WarcCodec.file(recs, gzip = id % 2 == 0)
          val idx = graft.functions.WarcCodec.parseFileIndexed(bytes)
          val full = graft.functions.WarcCodec.parseFile(bytes)
          val okRoundtrip = idx.length == full.length && idx.zip(full).forall {
            case ((_, off, len), f) =>
              graft.functions.WarcCodec.fetchRecord(bytes, off, len).exists { g =>
                g.targetUri == f.targetUri && g.recordId == f.recordId &&
                  java.util.Arrays.equals(g.payload, f.payload)
              }
          }
          val okTiling = idx.nonEmpty && idx.head._2 == 0L &&
            idx.sliding(2).forall {
              case Seq((_, o1, l1), (_, o2, _)) => o1 + l1 == o2
              case _ => true
            } && (idx.last._2 + idx.last._3 == bytes.length)
          (id, idx.length.toLong, okRoundtrip, okTiling)
        }
        .toDF("doc_id", "n_records", "ok_roundtrip", "ok_tiling")
    },

    // ── WET/WAT derivation (the crawl-distribution companions): each
    // doc's text rides a full HTML page (title, script decoy carrying
    // literal markup, k=id%4+1 root-relative links) through a WARC
    // response — HTTP wire codings rotating as in q154 — then through
    // the WET extraction rule (charset sniff → DOM → drop script →
    // normalized visible text) and the WAT envelope (title, resolved
    // outlinks, JSON block hash-gated as a string). ok_wet_roundtrip
    // additionally re-serializes the WET+WAT rows as conversion/
    // metadata WARC records (WARC-Refers-To linkage) and re-parses
    // them — the publishable-artifact invariant.
    "q167_wet_wat" -> { (s, dir) =>
      import s.implicits._
      val files = graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val anchors = (0 until k)
            .map(j => s"""<a href="/l/$j">l$j</a>""").mkString(" ")
          val html =
            s"""<!DOCTYPE html><html><head>
               |<title>T$id</title>
               |<script>var decoy = "<p>no $id</p>";</script>
               |</head>
               |<body>
               |<p>$text</p>
               |<p>$anchors</p>
               |</body></html>""".stripMargin
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:info-$id>", "2026-01-01T00:00:00Z",
              Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:resp-$id>", s"https://example.org/doc/$id",
              "2026-01-01T00:00:00Z", 200, "OK",
              "text/html; charset=utf-8",
              html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              gzipBody = id % 2 == 0, chunked = id % 4 >= 2))
          (s"doc-$id.warc", graft.functions.WarcCodec.file(recs, gzip = id % 2 == 1))
        }
      val responses = graft.sources.WarcSource.responses(
        graft.sources.WarcSource.fromBytes(files))
      responses.map { r =>
        val we = graft.sources.WarcDerive.wetOf(r)
        val wa = graft.sources.WarcDerive.watOf(r)
        // publishable-artifact invariant: conversion/metadata records
        // re-parse with the linkage and payloads intact
        val wetBytes = graft.sources.WarcDerive.wetFile(Seq(we), gzip = true)
        val watBytes = graft.sources.WarcDerive.watFile(Seq(wa), gzip = false)
        val wetBack = graft.functions.WarcCodec.parseFile(wetBytes)
        val watBack = graft.functions.WarcCodec.parseFile(watBytes)
        val ok = wetBack.length == 1 && watBack.length == 1 &&
          wetBack.head.warcType == "conversion" &&
          watBack.head.warcType == "metadata" &&
          wetBack.head.targetUri == we.target_uri &&
          new String(wetBack.head.payload,
            java.nio.charset.StandardCharsets.UTF_8) == we.text &&
          new String(watBack.head.payload,
            java.nio.charset.StandardCharsets.UTF_8) == wa.meta_json
        (we.target_uri.replaceAll("^.*/doc/", "").toLong,
          we.text, we.text_len, we.charset, wa.title.getOrElse(""),
          wa.n_links, wa.links.headOption.getOrElse(""), wa.meta_json, ok)
      }.toDF("doc_id", "text_out", "text_len", "charset", "title",
        "n_links", "first_link", "meta_json", "ok_wet_roundtrip")
    },

    // ── IDN hostnames (RFC 3492 Punycode): per doc a Unicode host is
    // encoded to its xn-- wire form and decoded back — the oracle
    // rebuilds the Unicode host with chr() arithmetic, so the decode
    // arm is hash-gated (and the encode arm feeds it; its RFC-sample
    // conformance is spec-pinned). The frontier's politeness grouping
    // is only correct if both spellings of a host collapse.
    "q187_idn_host" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val uni = "h" + (0xE0 + id % 16).toChar + "st" + (id % 10) +
            ".example"
          val ascii = graft.functions.Punycode.hostToAscii(uni)
            .getOrElse("")
          val back = graft.functions.Punycode.hostToUnicode(ascii)
            .getOrElse("")
          (id, back, ascii.split('.').head.startsWith("xn--"),
            back == uni)
        }
        .toDF("doc_id", "unicode_host", "is_idn", "roundtrip_ok")
    },

    // ── Wikipedia dump walk (.xml.bz2): per doc a real MediaWiki
    // export of k=id%3+1 pages is built, bzip2-compressed by the
    // commons-compress reference writer (MULTISTREAM concatenation —
    // the actual Wikipedia layout — when id%4==0), inflated back
    // through our own bzip2 decoder (Huffman groups → MTF/RLE2 →
    // inverse BWT → RLE1, block CRCs verified) and page-walked.
    // Titles/ns/ids and the byte-exact wikitext (entities included:
    // the doc text's '&'/'<' pass through escape→unescape) are under
    // the hash gate.
    "q190_wiki_dump" -> { (s, dir) =>
      import s.implicits._
      // bzip2 compress+decode per row over a one-split table: the whole
      // tier serialized on one core (8→32-core scaling ratio ≈ 1.0 in
      // the r17 driver scaling block) — repartition before the flatMap
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val k = (id % 3 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          def esc(x: String) = x.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          def pageXml(i: Int): String = {
            val body = text.substring(cuts(i), cuts(i + 1))
            s"""<page>
               |  <title>Doc $id part $i</title>
               |  <ns>${(id + i) % 16}</ns>
               |  <id>${id * 10 + i}</id>
               |  <revision><id>${id * 100 + i}</id>
               |  <text xml:space="preserve">${esc(body)}</text>
               |  </revision>
               |</page>""".stripMargin
          }
          val pagesXml = (0 until k).map(pageXml)
          def bz(x: String): Array[Byte] = {
            val bos = new java.io.ByteArrayOutputStream()
            val o = new org.apache.commons.compress.compressors.bzip2
              .BZip2CompressorOutputStream(bos, 1)
            o.write(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            o.close()
            bos.toByteArray
          }
          val payload =
            if (id % 4 == 0 && k > 1)
              bz("<mediawiki>\n" + pagesXml.head) ++
                bz(pagesXml.tail.mkString("\n") + "\n</mediawiki>")
            else
              bz("<mediawiki>\n" + pagesXml.mkString("\n") +
                "\n</mediawiki>")
          graft.functions.WikiDump.pagesFromBzip2(payload)
            .getOrElse(Vector.empty)
            .zipWithIndex
            .map { case (p, i) =>
              (id, i.toLong, p.title, p.ns.toLong, p.pageId, p.text)
            }
        }
        .toDF("doc_id", "page_idx", "title", "ns", "page_id", "text")
    },

    // ── the RANGED-SPLIT Wikipedia read under the oracle: a real
    // multistream archive (8 bzip2 streams × 5 pages, commons-compress
    // reference writer) is assembled on disk from docs 0-39 (a
    // CONSTANT 40-row driver assembly at every SF — fixture scaffolding
    // in the q181 write-path tradition), then read back through
    // WikiSource.pages — the production path: distributed signature
    // scan → lead()-window extents → one ranged decode task per
    // stream. `n_streams` rides every row, so the oracle hashes the
    // FAN-OUT contract (8 extents, not 1) along with every page's
    // id/title/body round trip.
    "q192_wiki_split_read" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1) // constant 40 rows
      def esc(x: String) = x.replace("&", "&amp;")
        .replace("<", "&lt;").replace(">", "&gt;")
      def pageXml(id: Long, text: String): String =
        s"""<page>
           |  <title>Doc $id</title>
           |  <ns>0</ns>
           |  <id>${id * 10 + 1}</id>
           |  <revision><id>${id * 100 + 1}</id>
           |  <text xml:space="preserve">${esc(text)}</text>
           |  </revision>
           |</page>""".stripMargin
      def bz(x: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val o = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorOutputStream(bos, 1)
        o.write(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        o.close()
        bos.toByteArray
      }
      val streams = docs.grouped(5).zipWithIndex.map { case (g, i) =>
        bz((if (i == 0) "<mediawiki>\n" else "") +
          g.map { case (id, t) => pageXml(id, t) }.mkString("\n") +
          (if (i == 7) "\n</mediawiki>" else ""))
      }.toSeq
      val file = java.nio.file.Paths
        .get(scratchDir("graft_wiki_q192"), "multi.xml.bz2")
      java.nio.file.Files.write(file, streams.reduce(_ ++ _))
      val nStreams = graft.sources.WikiSource
        .streamExtents(s, file.toString).count()
      graft.sources.WikiSource.pages(s, file.toString)
        .select((col("page_id") / 10).cast("long").as("doc_id"),
          col("title"), col("text").as("body"),
          lit(nStreams).as("n_streams"))
    },

    // ── the CDX-extent ranged WARC read under the oracle: a real
    // one-member-per-record .warc.gz (24 responses from docs 0-23,
    // constant-size driver assembly) lands on disk, its index is built
    // by the production indexer, and readIndexed fans the ONE archive
    // out across offset bands of 2 KiB — many ranged reads, never the
    // whole file. The oracle hashes every record's identity + entity
    // round trip and the >1-band fan-out flag.
    "q193_warc_ranged_read" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 24)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1) // constant 24 rows
      val records = docs.map { case (id, t) =>
        graft.functions.WarcCodec.responseRecord(
          s"<urn:uuid:q193-$id>", s"https://example.org/doc/$id",
          "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
          t.substring(0, math.min(64, t.length))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }.toSeq
      val bytes = graft.functions.WarcCodec.file(records, gzip = true)
      val file = java.nio.file.Paths
        .get(scratchDir("graft_warc_q193"), "crawl.warc.gz")
      java.nio.file.Files.write(file, bytes)
      val split = 2048L
      val index = graft.sources.WarcSource.index(
        s.createDataset(Seq((file.toString, bytes))))
      val fanout = index.select((col("offset") / split).cast("long"))
        .distinct().count() > 1
      graft.sources.WarcSource.readIndexed(index, splitBytes = split)
        .select(col("record_index").cast("long").as("record_index"),
          col("target_uri"), col("http_status").cast("long").as("status"),
          col("payload").cast("string").as("body"),
          lit(if (fanout) 1L else 0L).as("fanout"))
    },

    // ── the CAPSTONE composition gate: crawl container → extract →
    // quality gate → exact dedup → constrained transactional store →
    // snapshot read, end to end under ONE oracle. Every doc becomes a
    // single-record .warc.gz whose body is text(doc_id % 400) — so
    // bodies repeat by construction and the dedup leg has real work —
    // parsed back through WarcSource, UTF-8 round-tripped, gated on
    // length, deduped to min(doc_id) per body, appended into a txlog
    // table under a CHECK constraint, and read back as the snapshot.
    // All stages are the production operators; the oracle restates the
    // surviving set from the documents table alone.
    "q200_corpus_pipeline" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val bodies = docs.as("d")
        .join(docs.as("b"),
          col("d.doc_id") % 400 === col("b.doc_id"), "inner")
        .select(col("d.doc_id").as("doc_id"), col("b.text").as("body"))
      // crawl leg: one single-record gzip WARC per doc, parsed back
      val archives = bodies.as[(Long, String)].map { case (id, body) =>
        (s"mem://w$id.warc.gz",
          graft.functions.WarcCodec.file(Seq(
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:q200-$id>", s"https://example.org/p/$id",
              "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
              body.getBytes(java.nio.charset.StandardCharsets.UTF_8))),
            gzip = true))
      }
      val fetched = graft.sources.WarcSource.responses(
        graft.sources.WarcSource.fromBytes(archives))
        .select(
          regexp_extract(col("target_uri"), "/p/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("payload").cast("string").as("body"))
      // quality gate + exact dedup (min doc_id wins per body)
      val kept = fetched
        .filter(length(col("body")) >= 64)
        .groupBy(col("body"))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"),
          length(col("body")).cast("long").as("body_len"),
          size(regexp_extract_all(col("body"), lit("\\S+"), lit(0)))
            .cast("long").as("n_tokens"),
          col("body"))
      // constrained transactional store, then the snapshot IS the result
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q200"))
      t.ensureExists(kept.drop("body").schema)
      t.addConstraint("tokens_positive", "n_tokens > 0")
      t.append(kept.drop("body"))
      t.read()
    },
  )

  private[queries] val oracleBase: Map[String, String] = Map(

    // container identity: the oracle recomputes the fields the Spark
    // side ENCODED into a real WARC archive (gzip members, HTTP
    // framing) and then PARSED back; md5 pins the entity body
    "q154_warc_extract" ->
      """SELECT doc_id,
        |  'response' AS warc_type,
        |  'https://example.org/doc/' || doc_id AS target_uri,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 404 ELSE 200 END AS BIGINT)
        |    AS http_status,
        |  'text/html; charset=utf-8' AS http_content_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,

    // frontier identity: host/domain/path replayed per URL-shape arm;
    // the politeness shard re-derived through the shared md5 recipe
    "q157_url_frontier" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'site' || doc_id || '.co.uk'
        |      WHEN 1 THEN 'example.com'
        |      WHEN 2 THEN '10.0.0.7'
        |      WHEN 3 THEN 'host' || doc_id || '.com.au'
        |      ELSE NULL END AS domain
        |  FROM documents)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'https://www.sub.site' || doc_id || '.co.uk/a/b?q=' || doc_id
        |    WHEN 1 THEN 'http://user:pw@site' || doc_id || '.example.com:8080/idx.html#frag'
        |    WHEN 2 THEN 'https://10.0.0.7/p' || doc_id
        |    WHEN 3 THEN 'https://host' || doc_id || '.com.au'
        |    ELSE '/relative/only' END AS url,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'www.sub.site' || doc_id || '.co.uk'
        |    WHEN 1 THEN 'site' || doc_id || '.example.com'
        |    WHEN 2 THEN '10.0.0.7'
        |    WHEN 3 THEN 'host' || doc_id || '.com.au'
        |    ELSE NULL END AS host,
        |  domain,
        |  CAST('0x' || substring(md5(domain), 1, 15) AS BIGINT) % 64
        |    AS shard,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN '/a/b'
        |    WHEN 1 THEN '/idx.html'
        |    WHEN 2 THEN '/p' || doc_id
        |    WHEN 3 THEN '/'
        |    ELSE NULL END AS path
        |FROM u""".stripMargin,

    // urlset identity: every entry field replayed arithmetically
    "q158_sitemap_entries" ->
      """SELECT d.doc_id,
        |  'https://s' || d.doc_id || '.example/p/' || x.i AS loc,
        |  '2026-01-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    AS lastmod,
        |  CASE CAST((d.doc_id + x.i) % 3 AS INT)
        |    WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' ELSE 'monthly' END
        |    AS changefreq,
        |  CAST((d.doc_id + x.i) % 10 AS DOUBLE) / 10.0 AS priority
        |FROM documents d JOIN range(0, 3) x(i) ON true""".stripMargin,

    // window arithmetic + md5 shard replayed over the 7-domain collapse
    "q159_frontier_schedule" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'https://site' || (doc_id % 7) || '.example/d/' || doc_id AS url,
        |    'site' || (doc_id % 7) || '.example' AS domain,
        |    doc_id % 10 AS prio,
        |    (doc_id % 7 + 1) * 100 AS delay_ms
        |  FROM documents)
        |SELECT doc_id, url, domain,
        |  CAST('0x' || substring(md5(domain), 1, 15) AS BIGINT) % 32 AS shard,
        |  CAST(row_number() OVER w AS BIGINT) AS seq,
        |  CAST((row_number() OVER w - 1) * delay_ms AS BIGINT)
        |    AS fetch_offset_ms
        |FROM f
        |WINDOW w AS (PARTITION BY domain ORDER BY prio DESC, url)""".stripMargin,

    // resolution identity per anchor arm; decoys must vanish
    "q160_link_extract" ->
      """SELECT d.doc_id,
        |  CASE x.i
        |    WHEN 0 THEN 'https://other' || d.doc_id || '.example/z'
        |    WHEN 1 THEN 'https://w' || d.doc_id || '.example/r/s'
        |    WHEN 2 THEN 'https://w' || d.doc_id || '.example/a/b/c/d.html'
        |    WHEN 3 THEN 'https://w' || d.doc_id || '.example/a/up.html'
        |    WHEN 4 THEN 'https://cdn' || d.doc_id || '.example/lib.js'
        |    ELSE 'https://ref.example/p' END AS dst_url,
        |  'link' || x.i AS anchor,
        |  x.i = 5 AS nofollow
        |FROM documents d JOIN range(0, 6) x(i) ON true""".stripMargin,

    // index invariant: extent-only fetch ≡ sequential parse, extents
    // tile the archive — all flags must hold on every document
    "q165_warc_cdx" ->
      """SELECT doc_id,
        |  CAST(3 AS BIGINT) AS n_records,
        |  true AS ok_roundtrip,
        |  true AS ok_tiling
        |FROM documents""".stripMargin,

    // decision-table identity over the RFC 9309 precedence rules
    "q156_robots_check" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN '/p' || doc_id || '/x'
        |    WHEN 1 THEN '/p' || doc_id || '/pub/a'
        |    WHEN 2 THEN '/other'
        |    WHEN 3 THEN '/doc.pdf'
        |    ELSE '/doc.pdfx' END AS path,
        |  doc_id % 5 IN (1, 2, 4) AS allowed,
        |  CAST(doc_id % 7 + 1 AS BIGINT) AS crawl_delay
        |FROM documents""".stripMargin,

    // WET/WAT identity: the oracle recomputes the normalized visible
    // text (title + body + anchor texts, document order), the envelope
    // fields, and the exact JSON string the WAT block must carry
    "q167_wet_wat" ->
      """WITH exp AS (
        |  SELECT doc_id,
        |    'T' || doc_id || ' ' || text || ' ' ||
        |      CASE CAST(doc_id % 4 AS INT)
        |        WHEN 0 THEN 'l0'
        |        WHEN 1 THEN 'l0 l1'
        |        WHEN 2 THEN 'l0 l1 l2'
        |        ELSE 'l0 l1 l2 l3' END AS text_out
        |  FROM documents)
        |SELECT doc_id,
        |  text_out,
        |  CAST(length(text_out) AS BIGINT) AS text_len,
        |  'utf-8' AS charset,
        |  'T' || doc_id AS title,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_links,
        |  'https://example.org/l/0' AS first_link,
        |  '{"uri":"https://example.org/doc/' || doc_id ||
        |    '","status":200,"content_type":"text/html; charset=utf-8","title":"T'
        |    || doc_id || '","n_links":' || (doc_id % 4 + 1) || '}' AS meta_json,
        |  true AS ok_wet_roundtrip
        |FROM exp""".stripMargin,

    // wire identity on the decode arm: the Unicode host rebuilt by
    // chr() arithmetic must come back through encode → xn-- → decode
    "q187_idn_host" ->
      """SELECT doc_id,
        |  'h' || chr(CAST(224 + doc_id % 16 AS INT)) || 'st' ||
        |    (doc_id % 10) || '.example' AS unicode_host,
        |  true AS is_idn,
        |  true AS roundtrip_ok
        |FROM documents""".stripMargin,

    // corpus-drop identity: pages rebuilt arithmetically; the Spark
    // side recovers them through bzip2 (our decoder) + the XML walk
    "q190_wiki_dump" ->
      """SELECT d.doc_id,
        |  CAST(p.i AS BIGINT) AS page_idx,
        |  'Doc ' || d.doc_id || ' part ' || p.i AS title,
        |  CAST((d.doc_id + p.i) % 16 AS BIGINT) AS ns,
        |  CAST(d.doc_id * 10 + p.i AS BIGINT) AS page_id,
        |  substring(d.text,
        |    CAST(length(d.text) * p.i // (d.doc_id % 3 + 1) + 1 AS INT),
        |    CAST(length(d.text) * (p.i + 1) // (d.doc_id % 3 + 1)
        |       - length(d.text) * p.i // (d.doc_id % 3 + 1) AS INT))
        |    AS text
        |FROM documents d
        |JOIN range(0, 3) p(i) ON p.i < d.doc_id % 3 + 1""".stripMargin,

    // strip-rule identity: the oracle states the stripped text
    // directly (heading text kept, template+comment+File link gone,
    // links to anchors, emphasis markers off, bullet off)
    "q192_wiki_split_read" ->
      """SELECT doc_id,
        |  'Doc ' || doc_id AS title,
        |  text AS body,
        |  CAST(8 AS BIGINT) AS n_streams
        |FROM documents WHERE doc_id < 40""".stripMargin,
    "q200_corpus_pipeline" ->
      """WITH src AS (
        |  SELECT d.doc_id, b.text AS body
        |  FROM documents d JOIN documents b ON b.doc_id = d.doc_id % 400
        |), ok AS (
        |  SELECT * FROM src WHERE length(body) >= 64
        |), ded AS (
        |  SELECT min(doc_id) AS keep_id, body FROM ok GROUP BY body
        |)
        |SELECT keep_id,
        |  CAST(length(body) AS BIGINT) AS body_len,
        |  CAST(len(regexp_extract_all(body, '\S+')) AS BIGINT) AS n_tokens
        |FROM ded""".stripMargin,
    "q193_warc_ranged_read" ->
      """SELECT doc_id AS record_index,
        |  'https://example.org/doc/' || doc_id AS target_uri,
        |  CAST(200 AS BIGINT) AS status,
        |  substring(text, 1, 64) AS body,
        |  CAST(1 AS BIGINT) AS fanout
        |FROM documents WHERE doc_id < 24""".stripMargin,
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** text analysis and corpus shaping: quality heuristics, language ID,
  * tokenizers (BPE/WordPiece/UnigramLM), TF-IDF/BM25/phrase search,
  * PII redaction, HTML extraction, sampling/mixtures/packing/chunking.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtTextQueries {

  val queries: Map[String, Q] = Map(

    // ── token counting (whitespace + BPE-ish subword proxy).
    "q17_token_stats" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.subwordCount(col("text")).as("n_subwords"),
        round(T.avgTokenLen(col("text")), 6).as("avg_token_len"))
    },

    // ── quality scoring (length/punct/stopword ratios).
    "q18_quality_score" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(T.punctRatio(col("text")), 6).as("punct_ratio"),
        round(T.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        T.qualityScore(col("text")).as("quality"))
    },

    // ── language ID (marker-word voting + CJK codepoint check).
    "q19_lang_id" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.langId(col("text")).as("lang_pred"))
    },

    // ── Unicode NFC normalization (native codegen Expression —
    // Spark has no built-in): per doc the text gets decomposed
    // sequences appended (e+◌́, u+◌̈, A+◌̊, and s+◌̣+◌̇ which composes
    // TWICE through canonical ordering), then normalizes. The oracle
    // is DuckDB's independent utf8proc-based nfc_normalize — two
    // unrelated Unicode implementations must produce byte-identical
    // NFC, with code-point lengths before/after on the hash too.
    "q97_nfc_normalize" -> { (s, dir) =>
      val raw = concat(col("text"),
        lit(" Cafe\u0301 blu\u0308 A\u030A ss\u0323\u0307"))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          T.nfcNormalize(col("raw")).as("norm_text"),
          length(col("raw")).cast("long").as("len_before"),
          length(T.nfcNormalize(col("raw"))).cast("long").as("len_after"))
    },

    // ── deterministic stratified sampling: per-source keep fractions
    // from md5-hash variates — reproducible across runs/engines (oracle
    // recomputes the same md5 arithmetic). Binary-exact fractions so
    // double boundaries match the SQL bit-for-bit.
    "q51_stratified_sample" -> { (s, dir) =>
      graft.ext.Sampling.stratifiedSample(Tables.documents(s, dir),
          "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultFraction = 0.125, salt = "s1")
        .select(col("doc_id"), col("source"))
    },

    // ── token-budget mixture: per-source document selection in
    // deterministic hash order until the token budget fills — the
    // "600B web + 300B code" mixture pass, declaratively.
    "q52_token_budget_mixture" -> { (s, dir) =>
      graft.ext.Sampling.tokenBudgetMixture(Tables.documents(s, dir),
          "source", "doc_id", T.tokenCount(col("text")),
          Map("src0" -> 800L, "src1" -> 600L, "src2" -> 400L), salt = "mix")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).as("n_tokens"))
    },

    // ── temperature-scaled mixture (XLM-R rebalance): budgets are
    // COMPUTED as ⌊total·√n_s / Σ√n⌋ from per-source token totals
    // (α=0.5 — sqrt is correctly-rounded cross-engine, pow is not;
    // the normalizer is an ordered fold both engines replay
    // bit-identically), then the q52 md5-ordered trim applies them.
    // EXACT row-set oracle: DuckDB recomputes budgets and trim.
    "q102_temperature_mixture" -> { (s, dir) =>
      graft.ext.Sampling.temperatureMixture(Tables.documents(s, dir),
          "source", "doc_id", T.tokenCount(col("text")),
          totalTokens = 2000L, salt = "temp")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).as("n_tokens"))
    },

    // ── train/val/test split assignment by hash ranges: a row's split
    // never changes when the corpus grows (random shuffles can't
    // promise that). Binary-exact weights.
    "q53_split_assign" -> { (s, dir) =>
      graft.ext.Sampling.assignSplit(Tables.documents(s, dir), "doc_id",
          Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)), salt = "split")
        .select(col("doc_id"), col("split"))
    },

    // ── PII scrubbing: URL/email/phone redaction + per-doc audit count
    // (regex subset chosen to behave identically in Java regex and
    // RE2, so the oracle matches the redacted TEXT bit-for-bit).
    "q55_redact_pii" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.redactPii(col("text")).as("redacted"),
        T.piiCount(col("text")).as("n_pii"))
    },

    // ── Gopher/MassiveText repetition signals: fraction of tokens in
    // the most frequent word bigram + fraction of repeated trigram
    // instances, per document — the templated/looping-text filter.
    // Two-level hash agg keyed on (doc, gram); map-side combine
    // collapses exactly the repeats being measured.
    "q57_repetition_stats" -> { (s, dir) =>
      graft.ext.RepetitionStats.stats(Tables.documents(s, dir), "doc_id", "text")
    },

    // ── TF-IDF keyword extraction: top-3 most characteristic terms per
    // doc under reciprocal-df weighting (IEEE-exact, see TfIdf scaladoc
    // for why not ln). tf agg → df re-agg → term-dictionary equi-join +
    // broadcast scalar N → per-doc window top-k.
    "q58_tfidf_topk" -> { (s, dir) =>
      graft.ext.TfIdf.topTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
    },

    // ── corpus-trained bigram LM likelihood per doc (CCNet-style LM
    // quality filtering, dependency-free): add-0.5 smoothing over the
    // corpus vocabulary, mean transition probability as the score.
    // Train + score in one distributed pass; the "model" (bigram stat
    // table) never collects.
    "q59_bigram_lm_score" -> { (s, dir) =>
      graft.ext.NGramLM.scoreDocs(Tables.documents(s, dir), "doc_id", "text")
    },

    // ── C4-style heuristic cleaning signals + composite keep decision:
    // pure per-row projections, scan-stage at any scale (q55's shape).
    // The fixture corpus is unpunctuated word salad, so signals over the
    // RAW text would be constant-false and the oracle vacuous; the query
    // decorates the text deterministically by doc_id (~100 docs per
    // variant at sf0.01) so every dialect-sensitive construct —
    // instr/strpos, negative-index substring, the IN list, the keep
    // conjunction — is exercised in BOTH outcomes on both engines.
    "q61_c4_heuristics" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" Lorem ipsum dolor sit.")))
            .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" { code }")))
            .when(col("doc_id") % 5 === 2,
              concat(col("text"), lit(" A final sentence.")))
            .when(col("doc_id") % 5 === 3, concat(col("text"), lit("!")))
            .otherwise(col("text")).as("t"))
        .select(
          col("doc_id"),
          T.sentenceCount(col("t")).as("n_sentences"),
          T.hasLoremIpsum(col("t")).as("has_lorem"),
          T.hasCurlyBrace(col("t")).as("has_brace"),
          T.endsWithTerminalPunct(col("t")).as("ends_punct"),
          T.c4Keep(col("t")).as("keep"))
    },

    // ── deterministic sequence packing: md5-shuffle order, bucket-
    // sharded running token offsets, pack = ⌊start/seqLen⌋ — the
    // concat-and-chunk step of training-sequence preparation.
    "q62_sequence_pack" -> { (s, dir) =>
      graft.ext.Packing.packSequences(Tables.documents(s, dir), "doc_id",
          T.tokenCount(col("text")), seqLen = 256, nBuckets = 8, salt = "pack")
        .select(col("doc_id"), col("bucket"), col("n_tokens"),
          col("start_offset"), col("pack_idx"))
    },

    // ── fixed-size token-window chunking with overlap (context-window
    // preparation): 64-token windows every 48 tokens (16-token overlap).
    // Pure scan-stage generator — tokenize, sequence of starts,
    // posexplode + slice; no shuffle. Oracle pins the window algebra
    // (starts, sizes, text reassembly) bit-for-bit.
    "q65_chunk_overlap" -> { (s, dir) =>
      graft.ext.Chunking.chunkDocs(Tables.documents(s, dir),
        "doc_id", "text", chunkTokens = 64, overlap = 16)
    },

    // ── weighted (probability-proportional-to-size) sampling: keep each
    // doc with probability min(1, 100·n_chars/Σn_chars), decided by the
    // md5 variate — the "sample by token volume, not doc count" knob.
    // Exact row-SET oracle: the variate and the IEEE ·,< threshold are
    // bit-identical in DuckDB.
    "q67_weighted_sample" -> { (s, dir) =>
      graft.ext.Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), expectedRows = 100, salt = "wsamp")
    },

    // ── character-diversity quality signals (charset anomaly family):
    // alphabet size, top-char share, Simpson concentration — the
    // entropy-family signal without transcendentals, emitted as
    // fixed-point ×10⁶ longs (round(double,6) is NOT cross-engine
    // portable at exact .5 boundaries; integer DIV is). Two-level
    // (doc, char) hash agg; shuffle volume is docs × alphabet, not
    // corpus characters.
    "q70_char_diversity" -> { (s, dir) =>
      graft.ext.CharStats.charStats(Tables.documents(s, dir),
        "doc_id", "text")
    },

    // ── exactly-k-per-stratum sample: 20 docs per source in hash-rank
    // order — fixed-size per-group slices where Bernoulli's size
    // jitter won't do. Exact row-SET oracle (same variate + ordering).
    "q72_sample_k_per_group" -> { (s, dir) =>
      graft.ext.Sampling.sampleKPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "source", "doc_id", k = 20, salt = "topk")
    },

    // ── HTML boilerplate removal (the first stage of every web
    // corpus): per doc_id the document text is entity-escaped and
    // embedded in a realistic page — script block CONTAINING markup
    // (so strip order is on the gate), style block, headings, an
    // unknown entity that must pass through — then extracted back.
    // The oracle replays escape→wrap→extract in SQL; a slip in block
    // removal, tag stripping, entity order, or whitespace collapse
    // breaks the text hash on 500 rows.
    "q87_html_extract" -> { (s, dir) =>
      val wrapped = concat(
        lit("<html><head><style>p{margin:0}</style><script>var id="),
        col("doc_id").cast("string"),
        lit(";document.write(\"<b>x</b>\");</script></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"),
        T.htmlEscape(col("text")),
        lit("</p><div class=\"footer\">&copy; 2026 &amp; co</div></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), wrapped.as("html"))
        .select(col("doc_id"),
          T.htmlToText(col("html")).as("clean_text"),
          T.markupRatio(col("html")).as("markup_ratio"))
    },

    // ── BPE training inner loop (tokenizer construction): the
    // corpus-wide word-frequency aggregation followed by one exact
    // adjacent-char-pair count round — the statistic every BPE trainer
    // argmaxes over. Top-50 merge candidates ranked deterministically.
    // The rank window is partition-less but bounded by construction:
    // the pair table is ≤ |alphabet|² = 676 rows, driver-safe at any
    // corpus scale (the iterative trainer in ext.Bpe reuses this op
    // per round on the vocab-sized symbol table; adaptive rounds are
    // spec-pinned since SQL can't replay data-dependent merges).
    "q88_bpe_pair_stats" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val pairs = graft.ext.Bpe.pairCounts(
        graft.ext.Bpe.initialSymbols(
          graft.ext.Bpe.wordFreq(
            Tables.documents(s, dir).select(col("text")), "text")))
      pairs
        .select(concat(col("left"), col("right")).as("pair"),
          col("pair_count"))
        .withColumn("rank", row_number().over(
          W.orderBy(col("pair_count").desc, col("pair"))))
        .filter(col("rank") <= 50)
        .select(col("pair"), col("pair_count"), col("rank").cast("long").as("rank"))
    },

    // ── DOM-tree extraction (the reference's real BeautifulSoup walk,
    // pull_new_sales_list.py:123-137): per doc a fixture page with
    // id%5+1 listing cards — even cards a propertyCard-link with a
    // relative href, odd cards a nested plain a[href] with an absolute
    // URL + query string, card 4 a link with NO href (skipped, like
    // the reference's `if not href: continue`) — plus three DECOYS
    // carrying /properties/ ids in footer text, an HTML comment, and a
    // script blob. The DOM path must emit exactly the card ids and
    // NONE of the decoys (the whole-page regex path would report all
    // three — divergence spec-pinned); the oracle replays the card
    // arithmetic.
    "q116_dom_extract" -> { (s, dir) =>
      import s.implicits._
      val pages = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = (id % 5 + 1).toInt
          val cards = (0 until n).map { i =>
            val p = id * 1000 + i
            if (i == 4)
              """<div class="l-searchResult"><a class="propertyCard-link">no href</a></div>"""
            else if (i % 2 == 0)
              s"""<div class="card l-searchResult x"><a class="propertyCard-link" href="/properties/$p">View</a><br><span>.</span></div>"""
            else
              s"""<div data-i='$i' class="l-searchResult"><div class="inner"><a href="https://www.rightmove.co.uk/properties/$p?src=1">x</a></div></div>"""
          }.mkString("\n")
          val d = id * 1000
          (id,
            s"""<!DOCTYPE html><html><head><title>p$id</title>
               |<script>var u="/properties/${d + 999}";</script></head>
               |<body>$cards
               |<!-- /properties/${d + 888} -->
               |<footer>see <a href="/properties/${d + 777}">archive</a></footer>
               |</body></html>""".stripMargin)
        }
        .toDF("doc_id", "html")
      graft.operators.ScrapeParse.propertyIdsDom(pages, "doc_id", "html")
    },

    // ── BPE end-to-end roundtrip gate (closes the q88 loop: train →
    // tokenize → verify over the corpus vocabulary). Two invariants,
    // both emitting violations only (oracle = empty set):
    // "roundtrip" — tokenization must PARTITION the word (concat of
    // tokens reassembles it exactly); "no_compress" — any word
    // containing the first merge's pair as a substring has the two
    // chars adjacent in the initial split, so that merge MUST fire
    // and the token count must drop below the char count (kills a
    // tokenizer that never merges, which roundtrip alone would pass).
    "q104_bpe_roundtrip" -> { (s, dir) =>
      import graft.ext.Bpe
      val docs = Tables.documents(s, dir).select(col("text"))
      // ONE corpus pass: the vocab table is materialized once and
      // shared by training and tokenization (see trainFromWords)
      val words = Bpe.wordFreq(docs, "text").localCheckpoint()
      val merges = Bpe.trainFromWords(words, nMerges = 12)
      val tok = Bpe.tokenizeWords(words, merges)
      val broken = tok
        .filter(concat_ws("", col("syms")) =!= col("word"))
        .select(lit("roundtrip").as("kind"), col("word"))
      val uncompressed = merges.headOption match {
        case Some((l, r)) => tok
          .filter(col("word").contains(lit(l + r)) &&
            size(col("syms")) === length(col("word")))
          .select(lit("no_compress").as("kind"), col("word"))
        case None => tok.limit(0)
          .select(lit("no_compress").as("kind"), col("word"))
      }
      broken.union(uncompressed)
    },

    // ── unigram-LM (SentencePiece) tokenizer train + segment: the
    // prune-down tokenizer family beside BPE's merge-up (q104). EM
    // over the segmentation lattice fits piece probabilities on the
    // DISTINCT-word table (vocab-sized rounds — the Bpe scale
    // contract), expected counts aggregate as fixed-point micro-longs
    // (bit-deterministic across partitionings). Gate: roundtrip
    // (concat(viterbi pieces) == word for EVERY corpus word), no
    // out-of-vocab piece, vocab budget, and EM's monotone-likelihood
    // law within each phase — violations empty.
    "q123_unigram_lm_roundtrip" -> { (s, dir) =>
      graft.ext.UnigramLm.violations(Tables.documents(s, dir), "text",
        vocabSize = 400, maxPieceLen = 6, seedSize = 1200,
        emIters = 2, postPruneIters = 1)
    },

    // ── compression-ratio repetition signal (Gopher/MassiveText
    // family): per-doc zlib deflate accounting. Deflated lengths are
    // zlib-implementation-specific, so the gate is invariant-form
    // (q28/q44 pattern): raw byte counts hash exactly; the stored-
    // block upper bound and the 10×-repeat self-similarity fact
    // (deflate(text×10) < 10·deflate(text)) ride as pinned-true
    // booleans over every doc with ≥ 20 chars.
    "q89_compression_signal" -> { (s, dir) =>
      graft.ext.CompressionStats.perDoc(
          Tables.documents(s, dir).filter(length(col("text")) >= 20),
          "doc_id", "text").toDF()
        .select(col("doc_id"), col("raw_bytes"),
          (col("deflate_bytes") > 0 &&
            col("deflate_bytes") <= col("raw_bytes") + lit(64) +
              col("raw_bytes") / 1000).as("within_bound"),
          (col("deflate10_bytes") < col("deflate_bytes") * 10)
            .as("repeat_compresses_better"))
    },

    // ── WordPiece tokenizer invariant, driver-checked (zero-row
    // oracle, q104/q123 family): likelihood-scored merge training on
    // the distinct-word table, then greedy longest-match encoding
    // with ## continuations. The gate replays the encoding laws over
    // the real corpus vocabulary — pieces ∈ vocab, marker placement,
    // roundtrip, no UNK under alphabet coverage, vocab-word identity.
    // Completes the three production subword families next to BPE
    // (q104, merge-order) and unigram-LM (q123, Viterbi).
    "q127_wordpiece_roundtrip" -> { (s, dir) =>
      graft.ext.WordPiece.violations(
        Tables.documents(s, dir).select(col("text")), "text", nMerges = 12)
    },

    // ── BM25 ranked retrieval (Robertson-Walker Okapi weighting): the
    // lexical-search baseline and standard hard-negative miner for a
    // retrieval-training corpus. Rational (ln-free) idf so every score
    // op is IEEE-exact on both engines; per-doc totals sum ROUNDED
    // per-term scores as DECIMAL(38,6) (q59's bit-stable-sum recipe).
    // One corpus scan; query-sized frames broadcast; top-k is
    // TakeOrdered, never a global sort.
    "q128_bm25_topk" -> { (s, dir) =>
      graft.ext.Bm25.topK(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "hash", "vector"), k = 25)
    },

    // ── positional inverted index + exact phrase search: the
    // retrieval primitive BM25 can't answer. Postings build is one
    // scan + posexplode; the 3-word phrase query is term-filtered
    // postings legs equi-joined on (doc_id, anchor = pos − i). EXACT
    // oracle: DuckDB replays the postings and the anchor joins.
    "q133_phrase_search" -> { (s, dir) =>
      val idx = graft.ext.InvertedIndex.postings(
        Tables.documents(s, dir), "doc_id", "text")
      graft.ext.InvertedIndex.phraseSearch(idx,
        Seq("table", "key", "scan"))
    },

    // ── declarative data-quality expectations (the CHECK-constraint /
    // expectations gate): five row rules + a key rule in ONE scan of
    // lineitem, plus one referential anti-join against orders. EXACT
    // oracle: each rule replays as its own SQL count.
    "q134_quality_expectations" -> { (s, dir) =>
      import graft.operators.Expectations._
      val li = Tables.lineitem(s, dir)
      check(li, Seq(
        notNull("shipdate_not_null", "l_shipdate"),
        between("quantity_1_50", "l_quantity", lit(1.0), lit(50.0)),
        between("discount_0_01", "l_discount", lit(0.0), lit(0.1)),
        inSet("returnflag_domain", "l_returnflag", Seq("A", "N", "R")),
        Expect("price_positive", col("l_extendedprice") > 0.0),
        UniqueKey("order_line_unique", Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("orderkey_in_orders", Seq("l_orderkey"),
          Tables.orders(s, dir), Seq("o_orderkey"))))
    },

    // ── main-content extraction (boilerplate removal): each doc's text
    // is planted as the two-paragraph article of a full page skeleton —
    // header/nav, marker-classed sidebar, a link-dense related block
    // (plain class, so only the link-density SCORE can reject it),
    // comments, footer, plus a <script> decoy carrying literal "<p>"
    // markup. The extractor must prune the chrome, zero out the
    // link-dense block, pick the article container, and return exactly
    // the two paragraphs — which the oracle recomputes as trimmed
    // substrings of the source text.
    "q155_main_content" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val p1 = text.substring(0, 40)
          val p2 = text.substring(40)
          val html =
            s"""<!DOCTYPE html><html><head><title>Doc $id</title>
               |<script>var decoy = "<p>not content $id</p>";</script></head>
               |<body>
               |<header><h1>Site</h1><nav><a href="/">home</a> <a href="/a">archive</a></nav></header>
               |<div class="sidebar box"><p>subscribe to our newsletter for daily updates and offers</p></div>
               |<div id="page">
               |<div class="morelinks"><p><a href="/r/1">a very long related article title number one</a> <a href="/r/2">another even longer related article title number two</a></p></div>
               |<article id="story"><p>$p1</p><p>$p2</p></article>
               |<div class="comments"><p>first comment rambling on at considerable length about nothing</p><p>second comment also quite long and equally content free</p></div>
               |</div>
               |<footer><p>copyright twenty twenty six all rights reserved worldwide</p></footer>
               |</body></html>""".stripMargin
          (id, graft.functions.MainContent.extract(html))
        }
        .toDF("doc_id", "main_text")
    },

    // ── charset sniff + decode (the bytes→text seam): five wire
    // encodings of the doc text with a non-ASCII suffix that
    // discriminates every arm — UTF-8 BOM, windows-1252 via an
    // iso-8859-1 transport label (the € at 0x80 proves the WHATWG
    // superset reading), UTF-16LE BOM, <meta charset> prescan, and
    // undeclared 1252 bytes that must fail strict UTF-8 validation
    // into the fallback. The oracle replays charset and decoded text.
    "q162_charset_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val u = "éüñ" // éüñ
          val (bytes, header) = (id % 5) match {
            case 0 =>
              (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                (text + " " + u + "№").getBytes("UTF-8"), None)
            case 1 =>
              ((text + " " + u + "€").getBytes("windows-1252"),
                Some("text/html; charset=iso-8859-1"))
            case 2 =>
              (Array[Byte](0xff.toByte, 0xfe.toByte) ++
                (text + " " + u + "№").getBytes("UTF-16LE"), None)
            case 3 =>
              (("<meta charset=\"utf-8\">" + text + " " + u + "№")
                .getBytes("UTF-8"), None)
            case _ =>
              ((text + " " + u + "€").getBytes("windows-1252"), None)
          }
          val d = graft.functions.CharsetDetect.decode(bytes, header)
          (id, d.charset, d.text)
        }
        .toDF("doc_id", "charset", "text_out")
    },

    // ── wikitext→text strip rule under the oracle (q61's decoration
    // pattern): known markup — heading, nested template, comment,
    // plain and piped links, a dropped File: link, emphasis, a list
    // bullet — is wrapped around the doc text at arithmetic
    // positions, and the oracle states the stripped result directly.
    // A strip rule that eats content or leaks markers breaks the hash.
    "q191_wikitext_strip" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val half = text.length / 2
          val a = text.substring(0, half)
          val b = text.substring(half)
          val wikitext =
            s"== Section $id ==\n" +
              s"{{infobox|id=$id|inner={{nested|${id % 7}}}}}\n" +
              "{| class=\"wikitable\"\n|-\n! h\n" +
              s"| cell $id || v${id % 3}\n|}\n" +
              s"$a<!-- note $id -->\n" +
              s"''italic'' [[Target $id]] and [[P$id|alias ${id % 5}]] " +
              s"[[File:F$id.png|thumb|cap]]\n" +
              s"fact $id<ref name=\"n$id\">{{cite|web $id}}</ref>" +
              s" tail<ref group=g$id />\n" +
              s"* item $id\n" +
              s"[[Category:C${id % 11}]][[fr:Article $id]]" +
              s"[[de:Artikel $id|shown ${id % 9}]]\n" +
              b
          val stripped = graft.functions.WikiDump.stripMarkup(wikitext)
          (id, stripped)
        }
        .toDF("doc_id", "stripped")
    },
  )

  private[queries] val oracleBase: Map[String, String] = Map(

    // extraction identity: the oracle replays escape→wrap→extract with
    // the identical regex chain (Java∩RE2 subset) and literal replaces
    "q87_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><style>p{margin:0}</style><script>var id='
        |      || CAST(doc_id AS VARCHAR)
        |      || ';document.write("<b>x</b>");</script></head><body><h1>Doc '
        |      || CAST(doc_id AS VARCHAR) || '</h1><p>'
        |      || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
        |      || '</p><div class="footer">&copy; 2026 &amp; co</div></body></html>' AS html
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean_text
        |  FROM h)
        |SELECT doc_id, clean_text,
        |  round(CAST(length(clean_text) AS DOUBLE) / length(html), 6) AS markup_ratio
        |FROM t""".stripMargin,

    // BPE-statistic identity: word freq under the same [a-z]+ pre-tok,
    // per-position adjacent pairs (aa counts twice in aaa), exact sums
    "q88_bpe_pair_stats" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents),
        |wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
        |p AS (
        |  SELECT substring(word, i.i, 2) AS pair, freq
        |  FROM wf JOIN range(1, 1000) i(i) ON i.i <= length(word) - 1),
        |pc AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p GROUP BY pair)
        |SELECT pair, pair_count,
        |  row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
        |FROM pc
        |QUALIFY rank <= 50""".stripMargin,

    // invariant form (q28 family): exact raw byte counts + structural
    // deflate facts pinned true — DuckDB cannot replay zlib lengths
    "q89_compression_signal" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS raw_bytes,
        |  true AS within_bound, true AS repeat_compresses_better
        |FROM documents WHERE length(text) >= 20""".stripMargin,

    "q17_token_stats" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$tokRe')) AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |        / nullif(len(regexp_extract_all(text, '$tokRe')), 0), 6) AS avg_token_len
         |FROM documents""".stripMargin,

    "q18_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) AS punct,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         |    len(regexp_extract_all(lower(text),
         |      '\\b(the|a|an|and|or|of|in|to|is|it|that|was|for|on|with)\\b')) AS stophits,
         |    len(regexp_extract_all(text, '$tokRe')) AS toks,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id,
         |  round(CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE)/nonspace ELSE 0.0 END, 6) AS punct_ratio,
         |  round(CASE WHEN toks > 0 THEN CAST(stophits AS DOUBLE)/toks ELSE 0.0 END, 6) AS stopword_ratio,
         |  round(
         |    least(CAST(n_chars AS DOUBLE)/500.0, 1.0) * 0.4
         |    + least((CASE WHEN toks > 0 THEN CAST(stophits AS DOUBLE)/toks ELSE 0.0 END) * 5.0, 1.0) * 0.4
         |    + greatest(0.0, 1.0 - (CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE)/nonspace ELSE 0.0 END) * 4.0) * 0.2,
         |  6) AS quality
         |FROM t""".stripMargin,

    "q19_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une|est|que|pour|dans)\b')) AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit|sich|auf)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|en|un|una|por|como)\b')) AS s_es,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_zh > 0 THEN 'zh'
        |       WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
        |       WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
        |       WHEN s_de >= s_es THEN 'de'
        |       ELSE 'es' END AS lang_pred
        |FROM t""".stripMargin,

    // arithmetic replay of the CARD ids only — the decoys (777/888/999
    // slots) are absent by construction, so a tree-scoping slip in
    // either direction breaks rows or hash
    "q116_dom_extract" ->
      """SELECT d.doc_id, CAST(d.doc_id * 1000 + i.i AS VARCHAR) AS property_id
        |FROM documents d
        |JOIN range(0, 5) i(i)
        |  ON i.i < d.doc_id % 5 + 1 AND i.i <> 4""".stripMargin,

    // invariant form: empty unless the unigram tokenizer breaks
    // roundtrip/vocab/EM-monotonicity (q104's gate pattern)
    "q123_unigram_lm_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS detail
        |WHERE 1 = 0""".stripMargin,

    // invariant form: tokenization violations only — empty when BPE
    // partitions every vocab word and the first merge fires
    "q104_bpe_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS word
        |WHERE 1 = 0""".stripMargin,

    // independent-implementation NFC identity: DuckDB's utf8proc vs
    // the JDK Normalizer must agree byte-for-byte; combining marks
    // built via chr() so no editor/encoding layer can corrupt them
    "q97_nfc_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    text || ' Cafe' || chr(769) || ' blu' || chr(776)
        |         || ' A' || chr(778) || ' ss' || chr(803) || chr(775) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |  length(raw) AS len_before,
        |  length(nfc_normalize(raw)) AS len_after
        |FROM r""".stripMargin,

    // Deterministic-sampling twins: the same md5→60-bit→[0,1) variate
    // (CAST('0x'||hex AS BIGINT) ≡ Spark's conv(hex,16,10)), so the
    // selected row sets match exactly, not statistically.
    "q51_stratified_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id, source FROM u
        |WHERE u < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |                      WHEN 'src2' THEN 0.25 ELSE 0.125 END""".stripMargin,

    "q52_token_budget_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE cum <= CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 600
        |                         WHEN 'src2' THEN 400 ELSE NULL END""".stripMargin,

    // budget replay: ordered running-window sum of sqrt totals = the
    // driver's left-to-right fold; sqrt/floor are bit-identical
    "q102_temperature_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'temp'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tokens) AS st FROM t GROUP BY source),
        |ord AS (SELECT source, st,
        |    SUM(sqrt(CAST(st AS DOUBLE))) OVER (ORDER BY source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        |  FROM tot),
        |b AS (SELECT source,
        |    CAST(FLOOR(CAST(2000 AS DOUBLE) * (sqrt(CAST(st AS DOUBLE))
        |      / (SELECT MAX(rs) FROM ord))) AS BIGINT) AS budget
        |  FROM tot),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM t)
        |SELECT c.doc_id, c.source, c.n_tokens FROM c
        |JOIN b ON c.source = b.source
        |WHERE c.cum <= b.budget""".stripMargin,

    "q72_sample_k_per_group" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'topk'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
        |  FROM t)
        |SELECT doc_id, source FROM r WHERE rn <= 20""".stripMargin,

    "q67_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'wsamp'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |w AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS tot FROM documents)
        |SELECT doc_id, n_chars FROM t CROSS JOIN w
        |WHERE n_chars > 0 AND u * tot < 100.0 * n_chars""".stripMargin,

    "q53_split_assign" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u >= 0.875 THEN 'test'
        |       WHEN u >= 0.75 THEN 'val'
        |       WHEN u >= 0.0 THEN 'train' END AS split
        |FROM u""".stripMargin,

    "q55_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\. -]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(text, 'https?://[^\s]+'))
        |  + len(regexp_extract_all(regexp_replace(text,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?[0-9][0-9()\. -]{7,}[0-9]')) AS n_pii
        |FROM documents""".stripMargin,

    "q70_char_diversity" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
        |c AS (
        |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
        |  FROM base, unnest(range(1, n_chars + 1)) AS u(i)
        |  WHERE n_chars > 0),
        |g AS (SELECT doc_id, ch, COUNT(*) AS c FROM c GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    MAX(c) AS maxc, SUM(c * c) AS ss, SUM(c) AS n
        |  FROM g GROUP BY 1)
        |SELECT b.doc_id, b.n_chars,
        |  coalesce(a.n_distinct, 0) AS n_distinct_chars,
        |  CAST((a.maxc * 1000000) // a.n AS BIGINT) AS top_char_frac_e6,
        |  CAST((a.ss * 1000000) // (a.n * a.n) AS BIGINT) AS simpson_e6
        |FROM base b LEFT JOIN a ON a.doc_id = b.doc_id""".stripMargin,

    "q57_repetition_stats" ->
      """WITH w AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM w),
        |bgc AS (
        |  SELECT a.doc_id, a.wd || ' ' || b.wd AS g, COUNT(*) AS c
        |  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2),
        |bstat AS (SELECT doc_id, max(c) AS topc FROM bgc GROUP BY 1),
        |tgc AS (
        |  SELECT a.doc_id, a.wd || ' ' || b.wd || ' ' || c.wd AS g, COUNT(*) AS c
        |  FROM flat a
        |  JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN flat c ON a.doc_id = c.doc_id AND c.i = a.i + 2
        |  GROUP BY 1, 2),
        |tstat AS (SELECT doc_id, SUM(c) AS tot, COUNT(*) AS dist FROM tgc GROUP BY 1)
        |SELECT w.doc_id, w.n_tokens,
        |  round(CASE WHEN bstat.topc IS NOT NULL AND w.n_tokens > 0
        |             THEN least(bstat.topc * 2.0 / w.n_tokens, 1.0)
        |             ELSE 0.0 END, 6) AS top_bigram_frac,
        |  round(coalesce(1.0 - CAST(tstat.dist AS DOUBLE) / tstat.tot, 0.0), 6) AS dup_trigram_frac
        |FROM w
        |LEFT JOIN bstat ON bstat.doc_id = w.doc_id
        |LEFT JOIN tstat ON tstat.doc_id = w.doc_id""".stripMargin,

    "q58_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(words) AS term FROM w),
        |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM flat GROUP BY 1, 2),
        |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
        |    round(tfc.tf * (CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf
        |  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= 3""".stripMargin,

    "q61_c4_heuristics" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' Lorem ipsum dolor sit.'
        |         WHEN doc_id % 5 = 1 THEN text || ' { code }'
        |         WHEN doc_id % 5 = 2 THEN text || ' A final sentence.'
        |         WHEN doc_id % 5 = 3 THEN text || '!'
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[.!?]')) AS n_sentences,
        |  strpos(lower(t), 'lorem ipsum') > 0 AS has_lorem,
        |  strpos(t, '{') > 0 AS has_brace,
        |  substring(rtrim(t), -1, 1) IN ('.', '!', '?', '"') AS ends_punct,
        |  (len(regexp_extract_all(t, '[.!?]')) >= 1
        |   AND strpos(lower(t), 'lorem ipsum') = 0
        |   AND strpos(t, '{') = 0
        |   AND len(regexp_extract_all(t, '\S+')) >= 5) AS keep
        |FROM d""".stripMargin,

    "q62_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, u,
        |    CAST(floor(u * 8) AS BIGINT) AS bucket
        |  FROM t),
        |c AS (
        |  SELECT doc_id, bucket, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY u, doc_id) AS cum
        |  FROM b)
        |SELECT doc_id, bucket, n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
        |  CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS pack_idx
        |FROM c""".stripMargin,

    // Window starts every stride=48 tokens; DuckDB list slicing is
    // 1-based inclusive and clamps at the end exactly like Spark's
    // slice(), so the final short window matches bit-for-bit.
    "q65_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start_tok FROM t)
        |SELECT doc_id,
        |  CAST(start_tok // 48 AS INTEGER) AS chunk_idx,
        |  CAST(start_tok AS INTEGER) AS start_tok,
        |  len(toks[start_tok + 1 : start_tok + 64]) AS n_chunk_tokens,
        |  array_to_string(toks[start_tok + 1 : start_tok + 64], ' ') AS chunk_text
        |FROM s""".stripMargin,

    "q59_bigram_lm_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM w),
        |nb AS (
        |  SELECT a.doc_id, a.wd AS w1, b.wd AS w2, COUNT(*) AS nb
        |  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, SUM(nb) AS c12 FROM nb GROUP BY 1, 2),
        |c1 AS (SELECT w1, SUM(nb) AS c1 FROM nb GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT wd) AS v FROM flat),
        |scored AS (
        |  SELECT nb.doc_id, nb.nb,
        |    nb.nb * CAST(round((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v), 6)
        |                 AS DECIMAL(18,6)) AS contrib
        |  FROM nb
        |  JOIN c12 ON nb.w1 = c12.w1 AND nb.w2 = c12.w2
        |  JOIN c1 ON nb.w1 = c1.w1
        |  CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(nb) AS BIGINT) AS n_bigrams,
        |    round(CAST(SUM(contrib) AS DOUBLE) / SUM(nb), 6) AS avg_prob
        |  FROM scored GROUP BY 1)
        |SELECT w.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams, agg.avg_prob
        |FROM w LEFT JOIN agg ON agg.doc_id = w.doc_id""".stripMargin,

    // invariant form: empty unless a WordPiece encoding law fails
    "q127_wordpiece_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS word
        |WHERE 1 = 0""".stripMargin,

    // BM25 replay: same tokenization as q58, rational idf, the exact
    // (k1+1)/(1−b) literal folds spelled as double ADDS so both
    // engines round identically, decimal per-doc sum
    "q128_bm25_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM w),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
        |flat AS (SELECT doc_id, unnest(words) AS term FROM w),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM flat
        |       WHERE term IN ('spark', 'hash', 'vector') GROUP BY 1, 2),
        |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |per AS (
        |  SELECT tf.doc_id,
        |    round(((CAST(s.n_docs AS DOUBLE) - dfc.df + 0.5) / (dfc.df + 0.5))
        |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * ((1.0 - 0.75)
        |           + 0.75 * (dl.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))))),
        |      6) AS term_score
        |  FROM tf JOIN dfc ON tf.term = dfc.term
        |          JOIN dl ON tf.doc_id = dl.doc_id
        |          CROSS JOIN stats s),
        |sc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |    CAST(SUM(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE) AS score
        |  FROM per GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT doc_id, n_terms, score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 25""".stripMargin,

    // postings replay (q58 tokenization, 0-based positions) + the
    // anchor-aligned 3-way join
    "q133_phrase_search" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |p AS (
        |  -- positions via a bounded range join (no WITH ORDINALITY in
        |  -- DuckDB); fixture docs cap at 100 tokens, bound 1024
        |  SELECT doc_id, words[i.i + 1] AS term, CAST(i.i AS BIGINT) AS pos
        |  FROM w JOIN range(0, 1024) i(i) ON i.i < len(words)),
        |a0 AS (SELECT doc_id, pos AS anchor FROM p WHERE term = 'table'),
        |a1 AS (SELECT doc_id, pos - 1 AS anchor FROM p WHERE term = 'key'),
        |a2 AS (SELECT doc_id, pos - 2 AS anchor FROM p WHERE term = 'scan')
        |SELECT a0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  MIN(a0.anchor) AS first_pos
        |FROM a0 JOIN a1 ON a0.doc_id = a1.doc_id AND a0.anchor = a1.anchor
        |        JOIN a2 ON a0.doc_id = a2.doc_id AND a0.anchor = a2.anchor
        |GROUP BY a0.doc_id""".stripMargin,

    // each rule as its own SQL count over the same table
    "q134_quality_expectations" ->
      """WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
        |SELECT 'shipdate_not_null' AS rule,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
        |    AS n_violations, n.n_rows FROM n
        |UNION ALL
        |SELECT 'quantity_1_50',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_quantity >= 1.0 AND l_quantity <= 50.0, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'discount_0_01',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_discount >= 0.0 AND l_discount <= 0.1, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'returnflag_domain',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_returnflag IN ('A', 'N', 'R'), FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'price_positive',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_extendedprice > 0.0, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'order_line_unique',
        |  (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |   FROM lineitem),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'orderkey_in_orders',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |     (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
        |  n.n_rows FROM n""".stripMargin,

    // extraction identity: the oracle recomputes the article paragraphs
    // the Spark side planted in a chrome-laden page and extracted back
    "q155_main_content" ->
      """SELECT doc_id,
        |  trim(substr(text, 1, 40)) || chr(10) || trim(substr(text, 41))
        |    AS main_text
        |FROM documents""".stripMargin,

    // sniff-order identity: charset and decoded text per wire arm
    "q162_charset_decode" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 1 THEN 'windows-1252'
        |    WHEN 2 THEN 'utf-16le'
        |    WHEN 4 THEN 'windows-1252'
        |    ELSE 'utf-8' END AS charset,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 1 THEN text || ' éüñ€'
        |    WHEN 3 THEN '<meta charset="utf-8">' || text || ' éüñ№'
        |    WHEN 4 THEN text || ' éüñ€'
        |    ELSE text || ' éüñ№' END AS text_out
        |FROM documents""".stripMargin,
    "q191_wikitext_strip" ->
      """SELECT doc_id,
        |  'Section ' || doc_id || chr(10) || chr(10) || chr(10) ||
        |  substring(text, 1, CAST(length(text) // 2 AS INT)) || chr(10) ||
        |  'italic Target ' || doc_id || ' and alias ' ||
        |    (doc_id % 5) || ' ' || chr(10) ||
        |  'fact ' || doc_id || ' tail' || chr(10) ||
        |  'item ' || doc_id || chr(10) ||
        |  'shown ' || (doc_id % 9) || chr(10) ||
        |  substring(text, CAST(length(text) // 2 + 1 AS INT))
        |    AS stripped
        |FROM documents""".stripMargin,
  )
}

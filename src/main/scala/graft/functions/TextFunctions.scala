package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data pipelines (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting), all as
  * built-in Catalyst expressions — codegen'd, no UDFs, so a 100 TB scan
  * stays in one WholeStageCodegen span and the parquet reader prunes to
  * the `text` column only.
  *
  * Regex patterns are restricted to syntax shared by Java regex and RE2
  * (`\s`, `\S`, `\b`, alternation, classes) so the DuckDB oracle can run
  * the identical pattern.
  */
object TextFunctions {

  /** Whitespace token count = number of `\S+` runs. Robust on empty /
    * all-space strings (0, not 1, unlike split-based counting).
    */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** A BPE-ish subword proxy: counts letter-runs, digit-runs, and single
    * punctuation marks separately (≈ pre-tokenizer pieces per GPT-2's
    * split regex family, simplified to the Java∩RE2 subset).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Mean characters per token; null-safe (0 tokens → null). */
  def avgTokenLen(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val toks = tokenCount(text)
    when(toks > 0, nonSpace.cast("double") / toks)
  }

  /** Punctuation-character ratio over non-space characters. */
  def punctRatio(text: Column): Column = {
    val punct = regexp_count(text, lit("[.,;:!?'\"()\\[\\]-]"))
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    when(nonSpace > 0, punct.cast("double") / nonSpace).otherwise(lit(0.0))
  }

  /** English stopword hit ratio over tokens (classic quality signal:
    * natural prose has ~0.3-0.6; keyword spam / boilerplate is near 0).
    */
  def stopwordRatio(text: Column): Column = {
    val hits = regexp_count(lower(text),
      lit("\\b(the|a|an|and|or|of|in|to|is|it|that|was|for|on|with)\\b"))
    val toks = tokenCount(text)
    when(toks > 0, hits.cast("double") / toks).otherwise(lit(0.0))
  }

  /** Composite document-quality score in [0,1]: rewards prose-like
    * length, stopword presence, and moderate token length; penalizes
    * punctuation soup. Weights are heuristic (C4/Gopher-rule flavored).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    round(lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2, 6)
  }

  /** Marker-word language scores for the n-gram-heuristic language ID.
    * Word-level unigram/bigram markers per language over lowercased text.
    */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|was|for)\\b",
    "fr" -> "\\b(le|la|les|et|des|une|est|que|pour|dans)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit|sich|auf)\\b",
    "es" -> "\\b(el|los|las|y|es|en|un|una|por|como)\\b"
  )

  /** Language ID via stopword-marker voting: the language with the most
    * marker hits wins; zero hits everywhere → "und" (undetermined).
    * CJK is detected by codepoint range first (script beats stopwords).
    */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    val scores = langMarkers.map { case (code, re) =>
      (code, regexp_count(lowered, lit(re)))
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (code, sc)) =>
        when(sc > acc.getField("s"), struct(sc.as("s"), lit(code).as("l")))
          .otherwise(acc)
    }
    when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))
      .when(best.getField("s") > 0, best.getField("l"))
      .otherwise(lit("und"))
  }

  /** Canonical text normalization for fingerprinting: lowercase,
    * collapse whitespace runs, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Unicode NFC normalization (native codegen expression —
    * [[graft.plans.NfcNormalizeExpr]]): composed/decomposed variants of
    * the same visible text unify BEFORE any exact-match operator
    * (fingerprints, line dedup, shingles) sees them. Oracle twin:
    * DuckDB `nfc_normalize`.
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.NfcNormalizeExpr(bridge.expression(text)))
  }

  /** Content fingerprint: md5 of the normalized text — exact-dup key
    * that survives case/whitespace jitter. Oracle-able (DuckDB md5 is
    * identical).
    */
  def fingerprintMd5(text: Column): Column = md5(normalized(text).cast("binary"))

  /** 64-bit content fingerprint via xxhash64 (cheaper at scale; engine
    * internal — not oracle-able, DuckDB lacks xxhash64).
    */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  // ── C4-style heuristic cleaning signals (Raffel et al. 2020 §2.2:
  // the rules that produced C4 from CommonCrawl, adapted to this
  // engine's Java∩RE2 regex subset). All pure per-row projections —
  // scan-stage at any scale, composable into a keep-predicate filter.

  /** Sentence-terminal punctuation count — C4 drops pages with too few
    * sentences.
    */
  def sentenceCount(text: Column): Column = regexp_count(text, lit("[.!?]"))

  /** C4 drops any page containing the placeholder text "lorem ipsum". */
  def hasLoremIpsum(text: Column): Column = instr(lower(text), "lorem ipsum") > 0

  /** C4 drops pages containing '{' (usually leaked code/JS). */
  def hasCurlyBrace(text: Column): Column = instr(text, "{") > 0

  /** C4 keeps only lines ending in terminal punctuation; applied here
    * at document granularity (the fixtures are single-line docs).
    */
  def endsWithTerminalPunct(text: Column): Column =
    substring(rtrim(text), -1, 1).isin(".", "!", "?", "\"")

  /** The composite C4-flavored keep decision. Thresholds are the C4
    * paper's in spirit (≥ 1 sentence, ≥ minTokens words, no lorem
    * ipsum, no braces); tune per corpus.
    */
  def c4Keep(text: Column, minTokens: Int = 5): Column =
    sentenceCount(text) >= 1 && !hasLoremIpsum(text) && !hasCurlyBrace(text) &&
      tokenCount(text) >= minTokens

  // ── PII scrubbing (training-data hygiene) ──────────────────────────
  // Patterns are deliberately restricted to the regex subset that
  // behaves identically in Java regex (Spark) and RE2 (DuckDB): char
  // classes, bounded repetition, alternation — no lookaround, no
  // backreferences — so redaction is SQL-oracle-able bit-for-bit.

  private val urlRe = "https?://[^\\s]+"
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9()\\. -]{7,}[0-9]"

  /** Replace URLs, emails and phone-like digit runs with typed tokens.
    * URL first (emails embed in URLs), then email, then phone. A pure
    * per-row projection — scan-stage at any scale, idempotent
    * (the tokens match none of the patterns).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** How many PII spans [[redactPii]] would replace — the audit metric
    * per document.
    */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(urlRe), lit(0))) +
      size(regexp_extract_all(regexp_replace(text, urlRe, "<URL>"),
        lit(emailRe), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(regexp_replace(text, urlRe, "<URL>"), emailRe, "<EMAIL>"),
        lit(phoneRe), lit(0)))

  // ── HTML boilerplate removal (web-corpus extraction) ───────────────
  // The first stage of every web-scraped training corpus: strip markup,
  // keep prose. Same Java∩RE2 regex discipline as the PII patterns —
  // `(?s)` inline flag, non-greedy block bodies, no lookaround — so the
  // whole chain is SQL-oracle-able bit-for-bit (q87).

  /** Minimal HTML entity escape (fixture-synthesis side: document text
    * must survive embedding in markup). `&` first, then the brackets.
    */
  def htmlEscape(text: Column): Column =
    replace(replace(replace(text,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;"))

  /** HTML → text: drop script/style blocks WITH their contents (before
    * tag stripping — markup inside a script string must die with the
    * script, not leak as text), strip remaining tags, unescape the four
    * core entities (`&amp;` last, the standard order), collapse
    * whitespace. Unknown entities pass through verbatim — extraction
    * must not invent text. A pure codegen'd projection: scan-stage at
    * any scale, no UDF.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unescaped = replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Extracted-text-to-raw-markup length ratio — the boilerplate
    * density signal (low ratio = chrome-heavy page, a standard
    * keep/drop feature alongside [[qualityScore]]).
    */
  def markupRatio(html: Column): Column =
    round(length(htmlToText(html)).cast("double") / length(html), 6)
}

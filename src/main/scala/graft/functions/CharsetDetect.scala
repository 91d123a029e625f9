package graft.functions

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.ByteBuffer

/** Charset sniffing + decoding — the bytes→text seam between a fetched
  * payload ([[WarcCodec]]) and every text operator. Real crawl bodies
  * are a charset zoo; decoding them wrong silently corrupts the corpus
  * (the classic mojibake failure), so the detection order is the
  * WHATWG-encoding one browsers ship:
  *
  *  1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
  *  2. the transport's `Content-Type` charset parameter;
  *  3. an HTML `<meta charset>` / `http-equiv` declaration in the first
  *     1024 bytes (scanned as latin-1, per the prescan algorithm);
  *  4. strict UTF-8 validation, falling back to windows-1252 (the
  *     WHATWG superset reading of latin-1 labels) when invalid.
  *
  * Label normalization follows the same spec: `iso-8859-1`, `latin1`,
  * `ascii` and friends all decode as windows-1252. Pure per-row work;
  * runs scan-stage like the codec tier.
  */
object CharsetDetect {

  final case class Decoded(charset: String, text: String)

  private val MetaRe =
    ("(?is)<meta[^>]+?(?:charset\\s*=\\s*[\"']?([A-Za-z0-9_:-]+)" +
      "|content\\s*=\\s*[\"'][^\"']*charset=([A-Za-z0-9_:-]+))").r
  private val HeaderRe = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_:-]+)".r

  /** WHATWG label → canonical decoder name (subset: the labels that
    * dominate real crawls; unknown labels fall through to sniffing).
    */
  private def normalize(label: String): Option[String] = label.trim.toLowerCase match {
    case "utf-8" | "utf8" | "unicode-1-1-utf-8" => Some("utf-8")
    case "iso-8859-1" | "latin1" | "latin-1" | "l1" | "ascii" |
         "us-ascii" | "windows-1252" | "cp1252" | "iso8859-1" => Some("windows-1252")
    case "utf-16" | "utf-16le" => Some("utf-16le")
    case "utf-16be" => Some("utf-16be")
    case "iso-8859-15" | "latin9" => Some("iso-8859-15")
    case _ => None
  }

  private def charsetFor(name: String): Charset = name match {
    case "windows-1252" => Charset.forName("windows-1252")
    case "utf-16le" => Charset.forName("UTF-16LE")
    case "utf-16be" => Charset.forName("UTF-16BE")
    case "iso-8859-15" => Charset.forName("ISO-8859-15")
    case _ => Charset.forName("UTF-8")
  }

  private def strictDecode(b: Array[Byte], from: Int, cs: Charset): Option[String] =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(ByteBuffer.wrap(b, from, b.length - from)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  private def lenientDecode(b: Array[Byte], from: Int, cs: Charset): String =
    new String(b, from, b.length - from, cs)

  /** Sniff and decode a fetched body. `transportContentType` is the
    * HTTP `Content-Type` header value, when present.
    */
  def decode(bytes: Array[Byte], transportContentType: Option[String]): Decoded = {
    if (bytes == null || bytes.isEmpty) return Decoded("utf-8", "")
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
      (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return Decoded("utf-8", lenientDecode(bytes, 3, charsetFor("utf-8")))
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return Decoded("utf-16le", lenientDecode(bytes, 2, charsetFor("utf-16le")))
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return Decoded("utf-16be", lenientDecode(bytes, 2, charsetFor("utf-16be")))
    // 2. transport header
    transportContentType.flatMap(h => HeaderRe.findFirstMatchIn(h))
      .flatMap(m => normalize(m.group(1))) match {
      case Some(cs) => return Decoded(cs, lenientDecode(bytes, 0, charsetFor(cs)))
      case None => ()
    }
    // 3. meta prescan (first 1024 bytes as latin-1)
    val head = new String(bytes, 0, math.min(1024, bytes.length),
      Charset.forName("ISO-8859-1"))
    MetaRe.findFirstMatchIn(head)
      .flatMap(m => Option(m.group(1)).orElse(Option(m.group(2))))
      .flatMap(normalize) match {
      case Some(cs) => return Decoded(cs, lenientDecode(bytes, 0, charsetFor(cs)))
      case None => ()
    }
    // 4. UTF-8 validation, windows-1252 fallback
    strictDecode(bytes, 0, charsetFor("utf-8")) match {
      case Some(t) => Decoded("utf-8", t)
      case None => Decoded("windows-1252", lenientDecode(bytes, 0, charsetFor("windows-1252")))
    }
  }
}

package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

/** Real PDF read/write for the crawl-ingest tier: web crawls carry a
  * long tail of `application/pdf` responses, and a training-data
  * pipeline that cannot lift their text loses one of the densest
  * document sources in a dump. Reference scope: the reference repo
  * scrapes HTML only (`pull_new_sales_list.py`), so this is part of the
  * forward-looking corpus tier, not a ported operator.
  *
  * Decoder ([[extractText]]) is a conformant-subset ISO 32000 reader:
  *   - `startxref` → classic xref tables (free/in-use 20-byte entries,
  *     multi-section, `/Prev` incremental-update chains) AND
  *     cross-reference streams (`/Type/XRef`, `/W` field widths,
  *     `/Index` subsections, PNG predictors 10–15 on the decoded rows);
  *   - object streams (`/Type/ObjStm`, `/N`+`/First` header walk) — the
  *     layout virtually every post-1.5 producer emits;
  *   - full object grammar: literal strings (nested parens, all escape
  *     forms, octal, line continuations), hex strings, names with
  *     `#xx` escapes, arrays, dicts, indirect references, streams with
  *     indirect `/Length`;
  *   - filters: none, `/FlateDecode` (with PNG predictors),
  *     `/ASCIIHexDecode`, applied as a chain when `/Filter` is an array;
  *   - page-tree walk (nested `/Pages`, `/Contents` ref or array) and
  *     the text-showing operators `Tj`, `'`, `"`, `TJ` (string items
  *     shown, kerning numbers ignored).
  *
  * Deliberate simplification, documented contract: shown string bytes
  * are decoded as UTF-8 (we do not resolve font `/Encoding` or CMaps —
  * the fixtures and the common simple-text producers write byte strings
  * that are their own text). Totality: any structural damage yields the
  * pages recovered so far, never a throw — the [[Multimodal]] dirty-
  * corpus contract.
  *
  * Encoder ([[encode]]) writes spec-valid files in three shapes so the
  * decoder's arms are each exercised end-to-end by q166:
  * classic-xref/plain-content, classic-xref/Flate + kerned `TJ`, and
  * xref-stream + object-stream (predictor-12 Up-filtered index). An
  * incremental-update append ([[appendPage]]) exercises the `/Prev`
  * chain.
  */
object PdfCodec {

  // ── object model ───────────────────────────────────────────────────

  sealed trait Obj
  final case class PNum(v: Double) extends Obj {
    def isInt: Boolean = v == math.rint(v) && !v.isInfinite
    def toInt: Int = v.toInt
    def toLong: Long = v.toLong
  }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(s: String) extends Obj
  final case class PBool(b: Boolean) extends Obj
  case object PNull extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  /** `raw` is the undecoded stream body (between `stream`/`endstream`). */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  /** Extraction result: per-page text in page-tree order. */
  final case class PdfText(nPages: Int, pages: Seq[String],
      title: Option[String], nObjects: Int)

  // ── lexer / object parser ──────────────────────────────────────────

  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Byte-level PDF tokenizer. `resolve` supplies indirect `/Length`
    * values (null resolver → fall back to an `endstream` scan).
    */
  private final class Lexer(val b: Array[Byte], var pos: Int,
      resolve: PRef => Option[Obj]) {

    def eof: Boolean = pos >= b.length
    private def cur: Int = b(pos) & 0xff

    def skipWs(): Unit = {
      while (!eof) {
        if (isWs(cur)) pos += 1
        else if (cur == '%') { while (!eof && cur != '\n' && cur != '\r') pos += 1 }
        else return
      }
    }

    /** True + advance when the next non-ws bytes are exactly `kw`
      * followed by a delimiter/ws/EOF.
      */
    def tryKeyword(kw: String): Boolean = {
      skipWs()
      if (pos + kw.length > b.length) return false
      var i = 0
      while (i < kw.length) {
        if (b(pos + i) != kw.charAt(i).toByte) return false
        i += 1
      }
      val after = pos + kw.length
      if (after < b.length && !isWs(b(after) & 0xff) && !isDelim(b(after) & 0xff))
        return false
      pos = after
      true
    }

    /** One object; does NOT absorb a following `stream` body (see
      * [[parseMaybeStream]]).
      */
    def parseObj(): Obj = {
      skipWs()
      if (eof) return PNull
      cur match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (!eof && cur != ']') { items += parseObj(); skipWs() }
          if (!eof) pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') parseDict()
          else parseHexString()
        case 't' => if (tryKeyword("true")) PBool(true) else { pos += 1; PNull }
        case 'f' => if (tryKeyword("false")) PBool(false) else { pos += 1; PNull }
        case 'n' => if (tryKeyword("null")) PNull else { pos += 1; PNull }
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ => pos += 1; PNull
      }
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!eof && !isWs(cur) && !isDelim(cur)) {
        if (cur == '#' && pos + 2 < b.length) {
          val h = Character.digit(b(pos + 1), 16); val l = Character.digit(b(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(cur.toChar); pos += 1 }
        } else { sb.append(cur.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0) {
        val c = cur; pos += 1
        c match {
          case '\\' if !eof =>
            val e = cur; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (!eof && cur == '\n') pos += 1 // \CRLF → nothing
              case '\n' => // \LF → nothing (line continuation)
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 1
                while (k < 3 && !eof && cur >= '0' && cur <= '7') {
                  v = (v << 3) | (cur - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash dropped
            }
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1; if (depth > 0) out.write(')')
          case '\r' => // EOL inside string → LF; swallow a following LF
            if (!eof && cur == '\n') pos += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new ByteArrayOutputStream()
      var hi = -1
      while (!eof && cur != '>') {
        val d = Character.digit(cur, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
        pos += 1
      }
      if (!eof) pos += 1
      if (hi >= 0) out.write(hi << 4) // odd count: final digit + implied 0
      PStr(out.toByteArray)
    }

    private def parseDict(): PDict = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!eof && !(cur == '>' && pos + 1 < b.length && b(pos + 1) == '>')) {
        parseObj() match {
          case PName(k) => m += k -> parseObj()
          case _ => // tolerate junk key: value consumed next loop
        }
        skipWs()
      }
      if (!eof) pos += 2
      PDict(m.result())
    }

    private def parseNumberOrRef(): Obj = {
      val n1 = parseNumber()
      if (!n1.isInt || n1.v < 0) return n1
      // lookahead: <int> <int> R  ⇒ indirect reference
      val save = pos
      skipWs()
      if (!eof && cur >= '0' && cur <= '9') {
        val n2 = parseNumber()
        if (n2.isInt && tryKeyword("R")) return PRef(n1.toInt, n2.toInt)
      }
      pos = save
      n1
    }

    def parseNumber(): PNum = {
      skipWs()
      val start = pos
      if (!eof && (cur == '+' || cur == '-')) pos += 1
      while (!eof && ((cur >= '0' && cur <= '9') || cur == '.')) pos += 1
      val s = new String(b, start, pos - start, ISO_8859_1)
      PNum(if (s.isEmpty || s == "+" || s == "-") 0.0 else s.toDouble)
    }

    /** Object, plus the `stream … endstream` body when one follows. */
    def parseMaybeStream(): Obj = {
      val o = parseObj()
      o match {
        case d: PDict if tryKeyword("stream") =>
          // spec: keyword followed by CRLF or LF (not bare CR)
          if (!eof && cur == '\r') pos += 1
          if (!eof && cur == '\n') pos += 1
          val len: Int = d.get("Length") match {
            case Some(PNum(v)) => v.toInt
            case Some(r: PRef) => resolve(r) match {
              case Some(PNum(v)) => v.toInt
              case _ => -1
            }
            case _ => -1
          }
          val start = pos
          val end =
            if (len >= 0 && start + len <= b.length) start + len
            else indexOfKeyword(b, "endstream", start) // damaged /Length
          pos = end
          tryKeyword("endstream")
          PStream(d, java.util.Arrays.copyOfRange(b, start, end max start))
        case other => other
      }
    }
  }

  private def indexOfKeyword(b: Array[Byte], kw: String, from: Int): Int = {
    val pat = kw.getBytes(ISO_8859_1)
    var i = from max 0
    while (i + pat.length <= b.length) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    b.length
  }

  private def lastIndexOfKeyword(b: Array[Byte], kw: String): Int = {
    val pat = kw.getBytes(ISO_8859_1)
    var i = b.length - pat.length
    while (i >= 0) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i -= 1
    }
    -1
  }

  // ── filters ────────────────────────────────────────────────────────

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PNG-style row unfilter for `/Predictor` ≥ 10 (spec: each row is a
    * filter-type byte + `columns` bytes; sub/up/average/paeth over a
    * 1-byte pixel, the xref-stream shape).
    */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    if (columns <= 0) return data
    val rowLen = columns + 1
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      var c = 0
      while (c < columns) {
        val x = data(r * rowLen + 1 + c) & 0xff
        val a = if (c > 0) out(r * columns + c - 1) & 0xff else 0
        val b0 = if (r > 0) out((r - 1) * columns + c) & 0xff else 0
        val cc = if (r > 0 && c > 0) out((r - 1) * columns + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b0
          case 3 => x + ((a + b0) / 2)
          case 4 =>
            val p = a + b0 - cc
            val pa = math.abs(p - a); val pb = math.abs(p - b0); val pc = math.abs(p - cc)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b0 else cc)
          case _ => x
        }
        out(r * columns + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** PNG Up-filter (type 2) predictor encode, the common producer
    * choice for xref streams.
    */
  private def pngPredictUp(data: Array[Byte], columns: Int): Array[Byte] = {
    val rows = data.length / columns
    val out = new Array[Byte](rows * (columns + 1))
    var r = 0
    while (r < rows) {
      out(r * (columns + 1)) = 2
      var c = 0
      while (c < columns) {
        val above = if (r > 0) data((r - 1) * columns + c) & 0xff else 0
        out(r * (columns + 1) + 1 + c) =
          (((data(r * columns + c) & 0xff) - above) & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** Apply the stream's `/Filter` chain (+ `/DecodeParms` predictors). */
  private def decodeStream(s: PStream, resolve: PRef => Option[Obj]): Array[Byte] = {
    def deref(o: Obj): Obj = o match {
      case r: PRef => resolve(r).getOrElse(PNull)
      case x => x
    }
    val filters: Seq[String] = deref(s.dict.get("Filter").getOrElse(PNull)) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map(deref).collect { case PName(n) => n }
      case _ => Nil
    }
    val parms: Seq[Option[PDict]] = deref(
        s.dict.get("DecodeParms").orElse(s.dict.get("DP")).getOrElse(PNull)) match {
      case d: PDict => Seq(Some(d))
      case PArr(items) => items.map(deref).map { case d: PDict => Some(d); case _ => None }
      case _ => Seq.fill(filters.length)(None)
    }
    var data = s.raw
    filters.zipAll(parms, "", None).foreach {
      case ("FlateDecode", p) =>
        data = inflate(data)
        p.foreach { d =>
          val pred = d.get("Predictor").collect { case PNum(v) => v.toInt }.getOrElse(1)
          val cols = d.get("Columns").collect { case PNum(v) => v.toInt }.getOrElse(1)
          if (pred >= 10) data = pngUnpredict(data, cols)
        }
      case ("ASCIIHexDecode", _) => data = asciiHexDecode(data)
      case _ => // unknown filter: leave bytes (totality over fidelity)
    }
    data
  }

  // ── xref loading ───────────────────────────────────────────────────

  private sealed trait Loc
  private final case class AtOffset(off: Long) extends Loc
  private final case class InObjStm(stm: Int, idx: Int) extends Loc

  /** Document reader: xref chain → object map → lazy resolution. */
  private final class Reader(bytes: Array[Byte]) {
    private val locs = mutable.Map.empty[Int, Loc]
    private val cache = mutable.Map.empty[Int, Obj]
    private val objStmCache = mutable.Map.empty[Int, Vector[Obj]]
    var trailer: PDict = PDict(Map.empty)

    def nObjects: Int = locs.size

    private def lexAt(off: Long): Lexer =
      new Lexer(bytes, off.toInt, r => Some(resolve(r)))

    /** `num gen obj …` at a byte offset → the contained object. */
    private def parseIndirectAt(off: Long): Option[(Int, Obj)] = {
      if (off < 0 || off >= bytes.length) return None
      val lx = lexAt(off)
      val n = lx.parseNumber(); lx.parseNumber()
      if (!lx.tryKeyword("obj")) return None
      Some((n.toInt, lx.parseMaybeStream()))
    }

    def resolve(ref: PRef): Obj = resolveNum(ref.num)

    private def resolveNum(num: Int): Obj = cache.get(num) match {
      case Some(o) => o
      case None =>
        cache(num) = PNull // cycle guard while computing
        val o = locs.get(num) match {
          case Some(AtOffset(off)) =>
            parseIndirectAt(off) match {
              case Some((n, obj)) if n == num => obj
              case _ => PNull
            }
          case Some(InObjStm(stm, idx)) =>
            objStmObjects(stm).lift(idx).getOrElse(PNull)
          case None => PNull
        }
        cache(num) = o
        o
    }

    /** Parse every object in an `/ObjStm` once (header pairs, `/First`). */
    private def objStmObjects(stm: Int): Vector[Obj] =
      objStmCache.getOrElseUpdate(stm, {
        resolveNum(stm) match {
          case s: PStream =>
            val data = decodeStream(s, r => Some(resolve(r)))
            val n = s.dict.get("N").collect { case PNum(v) => v.toInt }.getOrElse(0)
            val first = s.dict.get("First").collect { case PNum(v) => v.toInt }.getOrElse(0)
            val hl = new Lexer(data, 0, _ => None)
            val offs = (0 until n).map { _ =>
              hl.parseNumber(); hl.parseNumber().toInt // (objnum, offset)
            }
            offs.map { o =>
              val ol = new Lexer(data, first + o, _ => None)
              ol.parseObj()
            }.toVector
          case _ => Vector.empty
        }
      })

    private def addLoc(num: Int, loc: Loc): Unit =
      if (!locs.contains(num)) locs(num) = loc // newest xref wins

    /** Classic table or xref stream at `off`; follows `/Prev`. */
    def loadXrefChain(off: Long): Unit = {
      var next = off
      var hops = 0
      while (next >= 0 && hops < 64) {
        hops += 1
        next = loadXrefAt(next)
      }
    }

    private def loadXrefAt(off: Long): Long = {
      if (off < 0 || off >= bytes.length) return -1
      val lx = lexAt(off)
      if (lx.tryKeyword("xref")) {
        // classic table: sections of "start count" + 20-byte entries
        var going = true
        while (going) {
          lx.skipWs()
          if (lx.tryKeyword("trailer")) {
            going = false
          } else if (lx.eof) { going = false } else {
            val start = lx.parseNumber().toInt
            val count = lx.parseNumber().toInt
            if (count < 0 || count > 10000000) { going = false }
            else {
              var i = 0
              while (i < count) {
                val o = lx.parseNumber().toLong
                lx.parseNumber() // generation
                lx.skipWs()
                val kind = if (!lx.eof) lx.b(lx.pos) else 'f'
                lx.pos += 1
                if (kind == 'n') addLoc(start + i, AtOffset(o))
                i += 1
              }
            }
          }
        }
        val t = lx.parseObj() match { case d: PDict => d; case _ => PDict(Map.empty) }
        if (trailer.m.isEmpty) trailer = t
        else trailer = PDict(t.m ++ trailer.m) // newest keys win
        t.get("Prev") match { case Some(PNum(v)) => v.toLong; case _ => -1 }
      } else {
        // xref stream
        parseIndirectAt(off) match {
          case Some((_, s: PStream)) if s.dict.get("Type").contains(PName("XRef")) =>
            val data = decodeStream(s, r => Some(resolve(r)))
            val w = s.dict.get("W") match {
              case Some(PArr(items)) => items.collect { case PNum(v) => v.toInt }
              case _ => Vector(1, 1, 1)
            }
            val size = s.dict.get("Size").collect { case PNum(v) => v.toInt }.getOrElse(0)
            val index: Seq[(Int, Int)] = s.dict.get("Index") match {
              case Some(PArr(items)) =>
                items.collect { case PNum(v) => v.toInt }.grouped(2).collect {
                  case Seq(a, b) => (a, b)
                }.toSeq
              case _ => Seq((0, size))
            }
            val rowLen = w.sum
            var p = 0
            index.foreach { case (start, count) =>
              var i = 0
              while (i < count && p + rowLen <= data.length) {
                var f = 0; val fields = new Array[Long](w.length)
                while (f < w.length) {
                  var v = 0L; var k = 0
                  while (k < w(f)) { v = (v << 8) | (data(p) & 0xff); p += 1; k += 1 }
                  fields(f) = v
                  f += 1
                }
                val tpe = if (w(0) == 0) 1L else fields(0)
                tpe match {
                  case 1 => addLoc(start + i, AtOffset(fields(1)))
                  case 2 => addLoc(start + i, InObjStm(fields(1).toInt, fields(2).toInt))
                  case _ => // free
                }
                i += 1
              }
            }
            if (trailer.m.isEmpty) trailer = s.dict
            else trailer = PDict(s.dict.m ++ trailer.m)
            s.dict.get("Prev") match { case Some(PNum(v)) => v.toLong; case _ => -1 }
          case _ => -1
        }
      }
    }
  }

  // ── text extraction ────────────────────────────────────────────────

  /** Lift per-page text (see class doc for the conformance envelope).
    * Total: corrupt input → the pages recovered before the damage.
    */
  def extractText(bytes: Array[Byte]): PdfText = {
    try extractTextUnsafe(bytes)
    catch { case _: Exception => PdfText(0, Nil, None, 0) }
  }

  private def extractTextUnsafe(bytes: Array[Byte]): PdfText = {
    val sx = lastIndexOfKeyword(bytes, "startxref")
    if (sx < 0) return PdfText(0, Nil, None, 0)
    val lx0 = new Lexer(bytes, sx, _ => None)
    lx0.tryKeyword("startxref")
    val xrefOff = lx0.parseNumber().toLong
    val rd = new Reader(bytes)
    rd.loadXrefChain(xrefOff)

    def deref(o: Obj): Obj = o match {
      case r: PRef => rd.resolve(r)
      case x => x
    }

    val title = deref(rd.trailer.get("Info").getOrElse(PNull)) match {
      case d: PDict => d.get("Title").map(deref).collect {
        case PStr(b) => decodeTextString(b)
      }
      case _ => None
    }

    val root = deref(rd.trailer.get("Root").getOrElse(PNull)) match {
      case d: PDict => d
      case _ => return PdfText(0, Nil, title, rd.nObjects)
    }

    // page-tree walk, nested /Pages allowed, cycle-bounded
    val pages = Vector.newBuilder[PDict]
    def walk(node: Obj, depth: Int): Unit = if (depth < 64) deref(node) match {
      case d: PDict =>
        d.get("Type") match {
          case Some(PName("Pages")) | None if d.get("Kids").isDefined =>
            deref(d.get("Kids").getOrElse(PNull)) match {
              case PArr(kids) => kids.foreach(walk(_, depth + 1))
              case _ =>
            }
          case Some(PName("Page")) => pages += d
          case _ =>
        }
      case _ =>
    }
    walk(root.get("Pages").getOrElse(PNull), 0)
    val pageDicts = pages.result()

    val texts = pageDicts.map { pg =>
      val contentObjs: Seq[Obj] = pg.get("Contents").map(deref) match {
        case Some(PArr(items)) => items.map(deref)
        case Some(o) => Seq(o)
        case None => Nil
      }
      // spec: multiple content streams form ONE stream, whitespace-joined
      val content = contentObjs.collect { case s: PStream =>
        decodeStream(s, r => Some(rd.resolve(r)))
      } match {
        case Nil => Array.emptyByteArray
        case one :: Nil => one
        case many =>
          val out = new ByteArrayOutputStream()
          many.foreach { c => out.write(c); out.write('\n') }
          out.toByteArray
      }
      extractContentText(content)
    }

    PdfText(pageDicts.length, texts, title, rd.nObjects)
  }

  /** Shown-text walk of one content stream: `Tj`/`'`/`"` strings and
    * `TJ` array string items, in stream order; kerning ignored; every
    * other operator consumed operand-free.
    */
  private def extractContentText(content: Array[Byte]): String = {
    val lx = new Lexer(content, 0, _ => None)
    val out = new ByteArrayOutputStream()
    val operands = mutable.ArrayBuffer.empty[Obj]
    while (!lx.eof) {
      lx.skipWs()
      if (!lx.eof) {
        val c = lx.b(lx.pos) & 0xff
        if (c == '(' || c == '<' || c == '[' || c == '/' ||
            c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          operands += lx.parseObj()
        } else {
          // operator keyword
          val start = lx.pos
          while (!lx.eof && !isWs(lx.b(lx.pos) & 0xff) && !isDelim(lx.b(lx.pos) & 0xff))
            lx.pos += 1
          if (lx.pos == start) lx.pos += 1 // lone delimiter: skip
          val op = new String(lx.b, start, lx.pos - start, ISO_8859_1)
          op match {
            case "Tj" | "'" =>
              operands.lastOption.collect { case PStr(b) => out.write(b) }
            case "\"" =>
              operands.lastOption.collect { case PStr(b) => out.write(b) }
            case "TJ" =>
              operands.lastOption.collect { case PArr(items) =>
                items.foreach { case PStr(b) => out.write(b); case _ => }
              }
            case _ =>
          }
          operands.clear()
        }
      }
    }
    new String(out.toByteArray, UTF_8)
  }

  /** PDF text-string decode: UTF-16BE when BOM-prefixed, else treated
    * as UTF-8 bytes (our documented stand-in for PDFDocEncoding, whose
    * ASCII range is identical).
    */
  private def decodeTextString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(b, UTF_8)

  // ── encoder ────────────────────────────────────────────────────────

  private def escapeString(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 16)
    b.foreach { byte =>
      val c = byte & 0xff
      c match {
        case '(' | ')' | '\\' => out.write('\\'); out.write(c)
        case _ if c >= 32 && c <= 126 => out.write(c)
        case _ =>
          out.write('\\')
          out.write('0' + ((c >> 6) & 7)); out.write('0' + ((c >> 3) & 7))
          out.write('0' + (c & 7))
      }
    }
    out.toByteArray
  }

  /** Content stream for one page: either one `Tj` per 40-byte chunk
    * with `Td` line moves, or a kerned `TJ` array — both show exactly
    * `text`'s bytes, so extraction round-trips byte-exactly.
    */
  private def contentFor(text: String, kerned: Boolean): Array[Byte] = {
    val bytes = text.getBytes(UTF_8)
    val chunks = bytes.grouped(40).toSeq
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
    if (kerned) {
      w("[")
      chunks.zipWithIndex.foreach { case (ch, i) =>
        if (i > 0) w(s" ${-40 - (i % 7)} ")
        out.write('('); out.write(escapeString(ch)); out.write(')')
      }
      w("] TJ\n")
    } else {
      chunks.foreach { ch =>
        out.write('('); out.write(escapeString(ch)); out.write(')')
        w(" Tj\n0 -14 Td\n")
      }
    }
    w("ET")
    out.toByteArray
  }

  /** Serialize an object (encoder side: the subset we emit). */
  private def ser(o: Obj): String = o match {
    case PNum(v) => if (v == math.rint(v)) v.toLong.toString else v.toString
    case PName(s) => "/" + s
    case PBool(b) => b.toString
    case PNull => "null"
    case PRef(n, g) => s"$n $g R"
    case PArr(items) => items.map(ser).mkString("[", " ", "]")
    case PDict(m) => m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"/$k ${ser(v)}" }.mkString("<< ", " ", " >>")
    case PStr(b) => "(" + new String(escapeString(b), ISO_8859_1) + ")"
    case _: PStream => sys.error("streams serialized separately")
  }

  /** Spec-valid single-shot writer. Object plan (1-based):
    * 1 Catalog, 2 Pages, 3 Font, then per page `(Page, Content…)`,
    * optional Info, and under `xrefStream=true` an ObjStm packing every
    * non-stream object plus the trailing XRef stream (Up-predicted).
    * `twoStreamsPerPage` splits each page's content at the midpoint
    * into a `/Contents` array (the multi-stream page arm).
    */
  def encode(pages: Seq[String], flate: Boolean = false,
      xrefStream: Boolean = false, kerned: Boolean = false,
      twoStreamsPerPage: Boolean = false,
      title: Option[String] = None): Array[Byte] = {
    val n = pages.length
    val contentPerPage = if (twoStreamsPerPage) 2 else 1
    val pageObj = (i: Int) => 4 + i * (1 + contentPerPage)
    val contentObj = (i: Int, j: Int) => pageObj(i) + 1 + j
    val infoObj = if (title.isDefined) Some(4 + n * (1 + contentPerPage)) else None
    val objStmNum = 4 + n * (1 + contentPerPage) + (if (title.isDefined) 1 else 0)
    val xrefStmNum = objStmNum + 1

    val catalog = PDict(Map("Type" -> PName("Catalog"), "Pages" -> PRef(2, 0)))
    val pagesDict = PDict(Map(
      "Type" -> PName("Pages"),
      "Kids" -> PArr((0 until n).map(i => PRef(pageObj(i), 0): Obj).toVector),
      "Count" -> PNum(n)))
    val font = PDict(Map("Type" -> PName("Font"),
      "Subtype" -> PName("Type1"), "BaseFont" -> PName("Helvetica")))
    def pageDict(i: Int) = PDict(Map(
      "Type" -> PName("Page"), "Parent" -> PRef(2, 0),
      "MediaBox" -> PArr(Vector(PNum(0), PNum(0), PNum(612), PNum(792))),
      "Resources" -> PDict(Map("Font" -> PDict(Map("F1" -> PRef(3, 0))))),
      "Contents" -> (if (contentPerPage == 1) PRef(contentObj(i, 0), 0)
        else PArr((0 until contentPerPage)
          .map(j => PRef(contentObj(i, j), 0): Obj).toVector))))
    val info = title.map(t => PDict(Map("Title" -> PStr(t.getBytes(UTF_8)))))

    val contents: Seq[Seq[Array[Byte]]] = pages.map { text =>
      if (twoStreamsPerPage) {
        // split SHOWN text at the midpoint: two independent BT…ET blocks
        val mid = text.length / 2
        Seq(contentFor(text.substring(0, mid), kerned),
          contentFor(text.substring(mid), kerned))
      } else Seq(contentFor(text, kerned))
    }

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = mutable.Map.empty[Int, Long]
    def writeObj(num: Int, body: String): Unit = {
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n$body\nendobj\n")
    }
    def writeStreamObj(num: Int, dict: Map[String, Obj], data: Array[Byte],
        doFlate: Boolean, extra: Map[String, Obj] = Map.empty): Unit = {
      offsets(num) = out.size().toLong
      val payload = if (doFlate) deflate(data) else data
      val d = PDict(dict ++ extra ++ Map(
        "Length" -> PNum(payload.length)) ++
        (if (doFlate) Map("Filter" -> PName("FlateDecode")) else Map.empty[String, Obj]))
      w(s"$num 0 obj\n${ser(d)}\nstream\n")
      out.write(payload)
      w("\nendstream\nendobj\n")
    }

    w("%PDF-1.5\n%âãÏÓ\n") // binary-marker comment line

    if (!xrefStream) {
      writeObj(1, ser(catalog))
      writeObj(2, ser(pagesDict))
      writeObj(3, ser(font))
      (0 until n).foreach { i =>
        writeObj(pageObj(i), ser(pageDict(i)))
        contents(i).zipWithIndex.foreach { case (c, j) =>
          writeStreamObj(contentObj(i, j), Map.empty, c, flate)
        }
      }
      infoObj.foreach(num => writeObj(num, ser(info.get)))
      val size = (if (title.isDefined) infoObj.get else
        contentObj(n - 1, contentPerPage - 1)) + 1
      val xrefOff = out.size().toLong
      w(s"xref\n0 $size\n")
      w("0000000000 65535 f \n")
      (1 until size).foreach { num =>
        w(f"${offsets(num)}%010d 00000 n \n")
      }
      val tr = PDict(Map("Size" -> PNum(size), "Root" -> PRef(1, 0)) ++
        infoObj.map(num => "Info" -> (PRef(num, 0): Obj)).toMap)
      w(s"trailer\n${ser(tr)}\nstartxref\n$xrefOff\n%%EOF\n")
    } else {
      // modern shape: dict objects ride an ObjStm; streams stand alone
      val packed: Seq[(Int, String)] =
        Seq(1 -> ser(catalog), 2 -> ser(pagesDict), 3 -> ser(font)) ++
          (0 until n).map(i => pageObj(i) -> ser(pageDict(i))) ++
          infoObj.map(num => num -> ser(info.get))
      val bodies = packed.map(_._2 + " ")
      val headerParts = {
        var off = 0
        packed.zip(bodies).map { case ((num, _), b) =>
          val h = s"$num $off "
          off += b.length
          h
        }
      }
      val header = headerParts.mkString
      val stmData = (header + bodies.mkString).getBytes(ISO_8859_1)
      (0 until n).foreach { i =>
        contents(i).zipWithIndex.foreach { case (c, j) =>
          writeStreamObj(contentObj(i, j), Map.empty, c, flate)
        }
      }
      writeStreamObj(objStmNum, Map(
        "Type" -> PName("ObjStm"), "N" -> PNum(packed.length),
        "First" -> PNum(header.length)), stmData, doFlate = true)

      // xref stream: W=[1 4 2]; rows for 0..xrefStmNum
      val size = xrefStmNum + 1
      val cols = 7
      val rows = new Array[Byte](size * cols)
      def setRow(num: Int, tpe: Int, f2: Long, f3: Int): Unit = {
        val p = num * cols
        rows(p) = tpe.toByte
        rows(p + 1) = ((f2 >> 24) & 0xff).toByte
        rows(p + 2) = ((f2 >> 16) & 0xff).toByte
        rows(p + 3) = ((f2 >> 8) & 0xff).toByte
        rows(p + 4) = (f2 & 0xff).toByte
        rows(p + 5) = ((f3 >> 8) & 0xff).toByte
        rows(p + 6) = (f3 & 0xff).toByte
      }
      setRow(0, 0, 0, 0xffff)
      packed.zipWithIndex.foreach { case ((num, _), idx) => setRow(num, 2, objStmNum, idx) }
      (0 until n).foreach { i =>
        (0 until contentPerPage).foreach { j =>
          setRow(contentObj(i, j), 1, offsets(contentObj(i, j)), 0)
        }
      }
      setRow(objStmNum, 1, offsets(objStmNum), 0)
      val xrefOff = out.size().toLong
      setRow(xrefStmNum, 1, xrefOff, 0)
      val predicted = pngPredictUp(rows, cols)
      writeStreamObj(xrefStmNum, Map(
        "Type" -> PName("XRef"), "Size" -> PNum(size),
        "W" -> PArr(Vector(PNum(1), PNum(4), PNum(2))),
        "Root" -> PRef(1, 0),
        "DecodeParms" -> PDict(Map("Predictor" -> PNum(12), "Columns" -> PNum(cols)))) ++
        infoObj.map(num => "Info" -> (PRef(num, 0): Obj)).toMap,
        predicted, doFlate = true)
      w(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }

  /** Incremental update: append one page to a classic-xref document
    * produced by [[encode]] — new content + page objects, a REWRITTEN
    * Pages object under the same object number (the incremental-update
    * idiom), and a new xref section whose trailer `/Prev` points at the
    * original table. Exercises the decoder's newest-entry-wins rule.
    */
  def appendPage(base: Array[Byte], text: String): Array[Byte] = {
    // locate the previous xref offset + /Size and /Root via a bounded scan
    val sx = lastIndexOfKeyword(base, "startxref")
    require(sx >= 0, "base has no startxref")
    val lx = new Lexer(base, sx, _ => None)
    lx.tryKeyword("startxref")
    val prevOff = lx.parseNumber().toLong
    val rd = new Reader(base)
    rd.loadXrefChain(prevOff)
    val size = rd.trailer.get("Size").collect { case PNum(v) => v.toInt }.getOrElse(0)
    val pagesDict = rd.resolve(PRef(2, 0)) match {
      case d: PDict => d
      case _ => sys.error("object 2 is not the Pages node")
    }
    val oldKids = pagesDict.get("Kids") match {
      case Some(PArr(items)) => items
      case _ => Vector.empty[Obj]
    }
    val newPageNum = size
    val newContentNum = size + 1

    val out = new ByteArrayOutputStream()
    out.write(base)
    if (base.nonEmpty && base(base.length - 1) != '\n') out.write('\n')
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = mutable.Map.empty[Int, Long]
    def writeObj(num: Int, body: String): Unit = {
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n$body\nendobj\n")
    }
    val newPages = PDict(pagesDict.m ++ Map(
      "Kids" -> PArr(oldKids :+ (PRef(newPageNum, 0): Obj)),
      "Count" -> PNum(oldKids.length + 1)))
    writeObj(2, ser(newPages))
    writeObj(newPageNum, ser(PDict(Map(
      "Type" -> PName("Page"), "Parent" -> PRef(2, 0),
      "MediaBox" -> PArr(Vector(PNum(0), PNum(0), PNum(612), PNum(792))),
      "Resources" -> PDict(Map("Font" -> PDict(Map("F1" -> PRef(3, 0))))),
      "Contents" -> PRef(newContentNum, 0)))))
    val content = contentFor(text, kerned = false)
    offsets(newContentNum) = out.size().toLong
    w(s"$newContentNum 0 obj\n${ser(PDict(Map("Length" -> PNum(content.length))))}\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")

    val xrefOff = out.size().toLong
    w("xref\n")
    w(s"2 1\n"); w(f"${offsets(2)}%010d 00000 n \n")
    w(s"$newPageNum 2\n")
    w(f"${offsets(newPageNum)}%010d 00000 n \n")
    w(f"${offsets(newContentNum)}%010d 00000 n \n")
    val tr = PDict(Map("Size" -> PNum(size + 2), "Root" -> PRef(1, 0),
      "Prev" -> PNum(prevOff.toDouble)))
    w(s"trailer\n${ser(tr)}\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}

package graft.functions

/** Dependency-free Punycode (RFC 3492) — the IDN leg of the URL
  * frontier: internationalized hostnames arrive on the wire as
  * `xn--`-prefixed ASCII labels, and politeness grouping /
  * registrable-domain logic ([[UrlFunctions]]) is only correct if
  * `xn--bcher-kva.example` and its Unicode form group together. This
  * implements the bootstring algorithm both directions (generalized
  * variable-length integers with bias adaptation) plus the IDNA
  * `xn--` label convention over a full hostname.
  *
  * Scope note: this is Punycode proper, not full IDNA2008 (no
  * nameprep/UTS-46 mapping tables — those are policy; the wire format
  * is the algorithm). Totality: malformed labels (bad basic code
  * points, overflow, truncated extension) → None.
  */
object Punycode {

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def digitToChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def charToDigit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Encode one Unicode label to its Punycode form (no xn-- prefix). */
  def encode(label: String): Option[String] = {
    if (label == null) return None
    val cps = label.codePoints().toArray
    val out = new StringBuilder
    cps.foreach(cp => if (cp < 0x80) out.append(cp.toChar))
    val basicLen = out.length
    if (basicLen > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = basicLen
    while (handled < cps.length) {
      var m = Int.MaxValue
      cps.foreach(cp => if (cp >= n && cp < m) m = cp)
      if (m - n > (Int.MaxValue - delta) / (handled + 1)) return None
      delta += (m - n) * (handled + 1)
      n = m
      cps.foreach { cp =>
        if (cp < n) {
          delta += 1
          if (delta == Int.MaxValue) return None
        }
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t =
              if (k <= bias) TMin
              else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) done = true
            else {
              out.append(digitToChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitToChar(q))
          bias = adapt(delta, handled + 1, handled == basicLen)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    Some(out.toString)
  }

  /** Decode one Punycode label (no xn-- prefix). */
  def decode(label: String): Option[String] = {
    if (label == null) return None
    val lastDelim = label.lastIndexOf('-')
    val basic = if (lastDelim > 0) label.substring(0, lastDelim) else ""
    if (basic.exists(_ >= 0x80)) return None
    val ext = label.substring(if (lastDelim >= 0) lastDelim + 1 else 0)
    val out = new java.util.ArrayList[Integer]()
    basic.foreach(c => out.add(c.toInt))
    var n = InitialN
    var i = 0
    var bias = InitialBias
    var pos = 0
    while (pos < ext.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= ext.length) return None
        val d = charToDigit(ext(pos))
        pos += 1
        if (d < 0) return None
        if (d > (Int.MaxValue - i) / w) return None
        i += d * w
        val t =
          if (k <= bias) TMin
          else if (k >= bias + TMax) TMax
          else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, out.size + 1, oldi == 0)
      if (i / (out.size + 1) > Int.MaxValue - n) return None
      n += i / (out.size + 1)
      i %= out.size + 1
      if (n < 0x80 || n > 0x10ffff) return None
      out.add(i, n)
      i += 1
    }
    val sb = new StringBuilder
    out.forEach(cp => sb.appendAll(Character.toChars(cp)))
    Some(sb.toString)
  }

  /** IDNA convention over a whole hostname: decode every `xn--`
    * label; pass-through ASCII labels; None if any IDN label is bad.
    */
  def hostToUnicode(host: String): Option[String] = {
    if (host == null) return None
    val labels = host.split('.')
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.toLowerCase.startsWith("xn--")) {
        decode(l.substring(4)) match {
          case Some(u) => out(i) = u
          case None => return None
        }
      } else out(i) = l
      i += 1
    }
    Some(out.mkString("."))
  }

  /** The other direction: any label with non-ASCII → xn-- form. */
  def hostToAscii(host: String): Option[String] = {
    if (host == null) return None
    val labels = host.split('.')
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.exists(_ >= 0x80)) {
        encode(l) match {
          case Some(a) => out(i) = "xn--" + a
          case None => return None
        }
      } else out(i) = l
      i += 1
    }
    Some(out.mkString("."))
  }
}

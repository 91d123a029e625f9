package graft.functions

/** G.711 companding codecs — µ-law (PCMU) and A-law (PCMA), the
  * 8-bit-per-sample encodings that telephony/speech corpora actually
  * ship in (WAV format codes 7 and 6). Both directions implemented
  * from the ITU-T G.711 segment layout; the decode tables are verified
  * BYTE-EXACTLY against the JDK's own converters
  * (`javax.sound.sampled`, an independent implementation) in the spec,
  * and the same integer formulas are restated in SQL by the oracle
  * query — so a slipped shift or sign convention breaks two
  * independent gates.
  *
  * Conventions (the wire forms):
  *  - µ-law bytes travel COMPLEMENTED; decoded magnitudes ride the
  *    `(mant·8 + 0x84) << exp − 0x84` segment grid, range ±32124.
  *  - A-law bytes travel XOR 0x55 (even-bit inversion); decoded
  *    range ±32256, with bit 7 = 1 meaning POSITIVE.
  */
object G711 {

  /** µ-law byte → linear 16-bit sample. */
  def mulawDecode(b: Byte): Short = {
    val u = (~b) & 0xff
    val sign = (u & 0x80) != 0
    val exp = (u >> 4) & 0x07
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    (if (sign) -mag else mag).toShort
  }

  /** Linear 16-bit sample → µ-law byte. */
  def mulawEncode(s0: Short): Byte = {
    val Bias = 0x84
    val Clip = 32635
    var s = s0.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** A-law byte → linear 16-bit sample. */
  def alawDecode(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    val sign = (a & 0x80) != 0
    val exp = (a >> 4) & 0x07
    val mant = a & 0x0f
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    (if (sign) mag else -mag).toShort
  }

  /** Linear 16-bit sample → A-law byte. */
  def alawEncode(s0: Short): Byte = {
    var s = s0.toInt
    val sign = if (s >= 0) 0x80 else { s = -s - 1; 0 }
    if (s > 32767) s = 32767
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant =
      if (exp == 0) (s >> 4) & 0x0f
      else (s >> (exp + 3)) & 0x0f
    ((sign | (exp << 4) | mant) ^ 0x55).toByte
  }
}

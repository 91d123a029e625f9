package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp3Codec._

class Mp3CodecSpec extends AnyFunSuite {

  test("frame walk round-trips the fixture across versions/rates/bitrates/ID3 decorations") {
    for {
      vbits <- Seq(3, 2, 0)
      bIdx <- Seq(1, 9, 14)
      rIdx <- 0 to 2
      mono <- Seq(true, false)
      id3 <- Seq(0, 57)
      v1 <- Seq(false, true)
    } {
      val n = 17
      val m = meta(mp3Bytes(vbits, bIdx, rIdx, mono, n, id3, v1))
      assert(m.isDefined, s"$vbits/$bIdx/$rIdx/$mono/$id3/$v1")
      val g = m.get
      val (ver, spf) = vbits match {
        case 3 => ("MPEG1", 1152); case 2 => ("MPEG2", 576)
        case _ => ("MPEG2.5", 576)
      }
      assert(g.version === ver)
      assert(g.channels === (if (mono) 1 else 2))
      assert(g.nFrames === n.toLong)
      assert(g.nSamples === n.toLong * spf)
    }
  }

  test("exact table rows: MPEG-1 44.1k/128kbps frame length walk (padding arm included)") {
    // 144000*128/44100 = 417 (+1 padded) — the canonical frame size
    val b = mp3Bytes(3, 9, 0, mono = false, nFrames = 6)
    val g = meta(b).get
    assert(g.bitrateKbps === 128 && g.sampleRate === 44100)
    // frames 0 and 3 padded: 2*418 + 4*417
    assert(b.length === 2 * 418 + 4 * 417)
  }

  test("totality: garbage, truncation, false sync, inconsistent streams all reject cleanly") {
    assert(meta(null) === None)
    assert(meta(Array.empty[Byte]) === None)
    assert(meta(Array.fill[Byte](512)(0x41)) === None)
    // a lone sync word with no consistent walk behind it
    val lone = Array.fill[Byte](64)(0xAA.toByte)
    lone(0) = 0xff.toByte; lone(1) = 0xfb.toByte
    assert(meta(lone) === None)
    // valid stream truncated mid-frame: the walk does not land on end
    val ok = mp3Bytes(3, 9, 0, mono = true, nFrames = 4)
    assert(meta(ok.dropRight(7)) === None)
    // every prefix must be total (no throw), whatever it parses to
    (0 until ok.length by 23).foreach(n => meta(ok.take(n)))
    // flipping the version mid-stream breaks consistency
    val mixed = ok.clone()
    val f2 = 144000 * 128 / 44100 + 1 // second frame offset (frame 0 padded)
    mixed(f2 + 1) = (mixed(f2 + 1) ^ 0x08).toByte // MPEG1 -> MPEG2 bit
    assert(meta(mixed) === None)
  }

  test("ID3v2 syncsafe size skips tags whose body contains sync-like bytes") {
    val clean = mp3Bytes(3, 5, 1, mono = true, nFrames = 3)
    // hand-build an ID3v2 tag with 0xFF 0xFB inside the body
    val body = Array.fill[Byte](200)(0xfb.toByte)
    body(0) = 0xff.toByte
    val tag = Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((200 >> 21) & 0x7f).toByte, ((200 >> 14) & 0x7f).toByte,
      ((200 >> 7) & 0x7f).toByte, (200 & 0x7f).toByte) ++ body
    assert(meta(tag ++ clean) === meta(clean))
  }
}

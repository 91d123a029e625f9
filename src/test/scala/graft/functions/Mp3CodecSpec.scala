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

  test("ID3v2 text frames round trip through all four version×encoding arms") {
    import Mp3Codec.{id3v2Frames, id3v2TagBytes}
    val values = Seq("TIT2" -> "Plain Ascii Title", "TPE1" -> "Ünïcode — Ärtist",
      "TALB" -> "中文专辑 €")
    for ((v24, enc) <- Seq((false, 0), (false, 1), (true, 1), (true, 2), (true, 3))) {
      val tag = id3v2TagBytes(values, v24 = v24, encoding = enc)
      val got = id3v2Frames(tag ++ mp3Bytes(3, 9, 0, mono = true, nFrames = 3))
      if (enc == 0) {
        // Latin-1 can carry Ünïcode/€? — ï/Ä yes, — and 中 no: only
        // assert the pure-ASCII frame
        assert(got("TIT2") == "Plain Ascii Title", s"v24=$v24 enc=$enc")
      } else {
        assert(got == values.toMap, s"v24=$v24 enc=$enc")
      }
    }
  }

  test("ID3v2 frame parse coexists with the frame walk and ID3v1 tail") {
    import Mp3Codec._
    val tag = id3v2TagBytes(Seq("TIT2" -> "t", "TCON" -> "genre"), v24 = true)
    val stream = tag ++ mp3Bytes(2, 4, 1, mono = false, nFrames = 7, id3v1 = true)
    assert(id3v2Frames(stream) == Map("TIT2" -> "t", "TCON" -> "genre"))
    assert(meta(stream).get.nFrames == 7)
    // absent tag → empty map; truncated tag → total
    assert(id3v2Frames(mp3Bytes(3, 5, 0, mono = true, nFrames = 2)).isEmpty)
    (0 until tag.length by 7).foreach(n => id3v2Frames(tag.take(n)))
  }

  test("v2.3 frame sizes are plain 32-bit, v2.4 syncsafe (grammar, not luck)") {
    import Mp3Codec._
    // a 200-char value makes the size byte >= 0x80 in plain encoding
    // but not in syncsafe — parsing each with the right rule succeeds
    val long = "x" * 200
    for (v24 <- Seq(false, true)) {
      val tag = id3v2TagBytes(Seq("TIT2" -> long), v24 = v24, encoding = if (v24) 3 else 0)
      assert(id3v2Frames(tag)("TIT2") == long, s"v24=$v24")
    }
  }
}

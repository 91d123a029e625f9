package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

class TarCodecSpec extends AnyFunSuite {
  import TarCodec._

  private val members = Seq(
    ("a.txt", "hello tar".getBytes(UTF_8), 1000L),
    ("dir/b.bin", Array.tabulate[Byte](700)(i => (i * 7).toByte), 2000L),
    ("empty", Array.emptyByteArray, 3000L))

  test("write → walk roundtrip: names, sizes, mtimes, payloads") {
    val tar = tarBytes(members)
    val es = entries(tar).get
    assert(es.map(e => (e.name, e.size, e.mtime)) ==
      members.map(m => (m._1, m._2.length.toLong, m._3)).toVector)
    val back = readAll(tar)
    assert(back.map(_._1) == members.map(_._1).toVector)
    back.zip(members).foreach { case ((_, got), (_, want, _)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("GNU longname member carries a >100-byte name") {
    val long = ("d" * 120) + "/x.txt"
    val tar = tarBytes(Seq((long, "x".getBytes(UTF_8), 5L)), gnuLong = true)
    val es = entries(tar).get
    assert(es.map(_.name) == Vector(long))
    assert(es.head.size == 1L)
  }

  test("pax path override carries a >100-byte name") {
    val long = ("p" * 104) + "/y.txt"
    val tar = tarBytes(Seq((long, "yy".getBytes(UTF_8), 5L)), gnuLong = false)
    val es = entries(tar).get
    assert(es.map(_.name) == Vector(long))
    assert(es.head.size == 2L)
  }

  /** Hand-assembled ustar header (the writer only emits ustar members,
    * so pax-size fixtures are built raw).
    */
  private def rawHeader(name: String, sizeField: Long,
      typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(UTF_8)
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(off: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val p = ("0" * (len - 1 - s.length)) + s
      for (i <- 0 until len - 1) h(off + i) = p(i).toByte
    }
    oct(100, 8, 420); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, sizeField); oct(136, 12, 0)
    h(156) = typeflag.toByte
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    val sum = h.zipWithIndex.map { case (b, i) =>
      if (i >= 148 && i < 156) ' '.toInt else b & 0xff
    }.sum
    val cs = java.lang.Long.toOctalString(sum.toLong)
    val p = ("0" * (6 - cs.length)) + cs
    for (i <- 0 until 6) h(148 + i) = p(i).toByte
    h(155) = ' '
    h
  }

  private def padded(b: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(b, (b.length + 511) / 512 * 512)

  test("pax size override drives the walk, not just the entry") {
    // member whose ustar size field is ZERO (as writers emit when the
    // pax record is authoritative); the real 12-byte payload extent
    // must come from the pax size or the walk lands mid-payload
    val body = "hello pax!!!".getBytes(UTF_8) // 12 bytes
    val paxPayload = "11 size=12\n".getBytes(UTF_8)
    val tar = padded(rawHeader("pax-size-hdr", paxPayload.length.toLong, 'x')) ++
      padded(paxPayload) ++
      padded(rawHeader("f.txt", 0L, '0')) ++
      padded(body) ++
      new Array[Byte](1024)
    val es = entries(tar).get
    assert(es.map(e => (e.name, e.size)) == Vector(("f.txt", 12L)))
    assert(new String(readEntry(tar, es.head).get, UTF_8) == "hello pax!!!")
    // and a pax size that overruns the blocks actually present → None
    val paxBig = "13 size=2000\n".getBytes(UTF_8)
    val lying = padded(rawHeader("pax-size-hdr", paxBig.length.toLong, 'x')) ++
      padded(paxBig) ++
      padded(rawHeader("f.txt", 0L, '0')) ++
      new Array[Byte](1024)
    assert(entries(lying).isEmpty)
  }

  test("checksum tamper and truncation → None") {
    val tar = tarBytes(members)
    val bad = tar.clone()
    bad(0) = 'z'.toByte // name byte changes the sum
    assert(entries(bad).isEmpty)
    assert(entries(java.util.Arrays.copyOfRange(tar, 0, 512)).isEmpty)
    assert(entries(null).isEmpty)
    assert(entries("not a tar".getBytes(UTF_8)).isEmpty)
    // missing second terminator block
    assert(entries(java.util.Arrays.copyOfRange(tar, 0, tar.length - 512)).isEmpty)
  }

  test("tar.gz composition roundtrips") {
    val tar = tarBytes(members)
    val gz = gzip(tar)
    assert(gz.length < tar.length) // really compressed
    val back = gunzip(gz).get
    assert(java.util.Arrays.equals(back, tar))
    assert(gunzip("junk".getBytes(UTF_8)).isEmpty)
  }

  test("cross-check: GNU tar reads our archive, we read GNU tar's") {
    val tarBin = Paths.get("/usr/bin/tar")
    assume(Files.isExecutable(tarBin))
    val dir = Files.createTempDirectory("tarspec")
    val ours = dir.resolve("ours.tar")
    Files.write(ours, tarBytes(members))
    // (a) GNU tar lists our archive: names in order
    val list = new String(
      new ProcessBuilder("/usr/bin/tar", "-tf", ours.toString)
        .redirectErrorStream(true).start().getInputStream.readAllBytes,
      UTF_8).trim.split("\n").toVector
    assert(list == members.map(_._1).toVector)
    // (b) GNU tar writes an archive; our walk recovers names+payloads
    val f1 = dir.resolve("one.txt"); Files.write(f1, "alpha".getBytes(UTF_8))
    val sub = dir.resolve("s"); Files.createDirectory(sub)
    val f2 = sub.resolve("two.bin"); Files.write(f2, Array[Byte](1, 2, 3, 4))
    val theirs = dir.resolve("theirs.tar")
    val rc = new ProcessBuilder("/usr/bin/tar", "--format=ustar", "-cf",
      theirs.toString, "-C", dir.toString, "one.txt", "s/two.bin")
      .start().waitFor()
    assert(rc == 0)
    val got = readAll(Files.readAllBytes(theirs))
    assert(got.map(_._1) == Vector("one.txt", "s/two.bin"))
    assert(new String(got(0)._2, UTF_8) == "alpha")
    assert(got(1)._2.toVector == Vector[Byte](1, 2, 3, 4))
  }
}

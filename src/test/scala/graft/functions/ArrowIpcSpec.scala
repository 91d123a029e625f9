package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import scala.jdk.CollectionConverters._

class ArrowIpcSpec extends AnyFunSuite {
  import ArrowIpc._

  private def schema = new Schema(List(
    new Field("id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("v", FieldType.nullable(new ArrowType.Int(64, true)), null),
    new Field("s", FieldType.nullable(new ArrowType.Utf8()), null),
    new Field("flag", FieldType.notNullable(new ArrowType.Bool()), null),
    new Field("d", FieldType.notNullable(
      new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null),
    new Field("small", FieldType.notNullable(new ArrowType.Int(32, true)), null)
  ).asJava)

  private def writeFile(batches: Seq[Range]): Array[Byte] = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    w.start()
    batches.foreach { range =>
      root.allocateNew()
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val v = root.getVector("v").asInstanceOf[BigIntVector]
      val s = root.getVector("s").asInstanceOf[VarCharVector]
      val flag = root.getVector("flag").asInstanceOf[BitVector]
      val d = root.getVector("d").asInstanceOf[Float8Vector]
      val small = root.getVector("small").asInstanceOf[IntVector]
      range.zipWithIndex.foreach { case (i, r) =>
        id.setSafe(r, i.toLong)
        if (i % 5 == 0) v.setNull(r) else v.setSafe(r, i * 3L - 9)
        if (i % 7 == 0) s.setNull(r)
        else s.setSafe(r, s"row$i héllo".getBytes("UTF-8"))
        flag.setSafe(r, if (i % 2 == 0) 1 else 0)
        d.setSafe(r, i.toDouble / 4)
        small.setSafe(r, i - 100)
      }
      root.setRowCount(range.length)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    bos.toByteArray
  }

  test("arrow-java file decodes natively: schema, values, nulls") {
    val bytes = writeFile(Seq(0 until 300))
    val m = meta(bytes).get
    assert(m.fields.map(f => (f.name, f.tpe, f.nullable)) == Vector(
      ("id", "int64", false), ("v", "int64", true), ("s", "utf8", true),
      ("flag", "bool", false), ("d", "float64", false),
      ("small", "int32", false)))
    assert(m.nBatches == 1 && m.nRows == 300L)
    val rows = readRows(bytes).get
    (0 until 300).foreach { i =>
      val r = rows(i)
      assert(r(0) == Some(i.toLong))
      assert(r(1) == (if (i % 5 == 0) None else Some(i * 3L - 9)))
      assert(r(2) == (if (i % 7 == 0) None else Some(s"row$i héllo")))
      assert(r(3) == Some(i % 2 == 0))
      assert(r(4) == Some(i.toDouble / 4))
      assert(r(5) == Some(i - 100))
    }
  }

  test("multiple record batches concatenate in order") {
    val bytes = writeFile(Seq(0 until 100, 100 until 250, 250 until 260))
    val m = meta(bytes).get
    assert(m.nBatches == 3 && m.nRows == 260L)
    val rows = readRows(bytes).get
    assert(rows.map(_(0)) == (0 until 260).map(i => Some(i.toLong)))
  }

  test("stream format: in-band schema, batches, end-of-stream marker") {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    w.start()
    Seq(0 until 40, 40 until 95).foreach { range =>
      root.allocateNew()
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val v = root.getVector("v").asInstanceOf[BigIntVector]
      val s = root.getVector("s").asInstanceOf[VarCharVector]
      val flag = root.getVector("flag").asInstanceOf[BitVector]
      val d = root.getVector("d").asInstanceOf[Float8Vector]
      val small = root.getVector("small").asInstanceOf[IntVector]
      range.zipWithIndex.foreach { case (i, r) =>
        id.setSafe(r, i.toLong)
        if (i % 5 == 0) v.setNull(r) else v.setSafe(r, i * 3L - 9)
        s.setSafe(r, s"x$i".getBytes("UTF-8"))
        flag.setSafe(r, i % 2)
        d.setSafe(r, i.toDouble)
        small.setSafe(r, i)
      }
      root.setRowCount(range.length)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    val rows = readStreamRows(bos.toByteArray).get
    assert(rows.length == 95)
    assert(rows.map(_(0)) == (0 until 95).map(i => Some(i.toLong)))
    assert(rows(5)(1) == None && rows(6)(1) == Some(9L))
    assert(readStreamRows("no schema here".getBytes).isEmpty)
  }

  test("total on garbage, truncation, and non-arrow magic") {
    assert(readRows(null).isEmpty)
    assert(readRows("ARROW1 but not really ARROW1".getBytes).isEmpty)
    val good = writeFile(Seq(0 until 50))
    assert(readRows(java.util.Arrays.copyOfRange(good, 0, good.length - 7)).isEmpty)
    val bad = good.clone()
    bad(bad.length - 8) = 0x7f // lie about footer length
    assert(readRows(bad).isEmpty)
  }

  test("single-byte corruption fuzz never throws (utf8 offsets included)") {
    // deterministic sweep: flip each of a spread of byte positions to
    // extreme values and require parse to return (Some or None), never
    // throw — the utf8 offset buffer is in range, so the lying-offset
    // StringIndexOutOfBounds path is exercised
    val good = writeFile(Seq(0 until 40))
    var i = 8 // keep the leading magic so parsing proceeds
    while (i < good.length - 10) {
      for (v <- Seq(0x7f, 0xff, 0x80)) {
        val mut = good.clone()
        mut(i) = v.toByte
        readRows(mut) // must not throw
        readStreamRows(mut)
      }
      i += 7
    }
  }
}

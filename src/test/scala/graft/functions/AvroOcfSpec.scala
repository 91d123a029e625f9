package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import scala.jdk.CollectionConverters._

class AvroOcfSpec extends AnyFunSuite {
  import AvroOcf._

  private val schemaJson =
    """{"type":"record","name":"row","fields":[
      |{"name":"id","type":"long"},
      |{"name":"v","type":["null","long"]},
      |{"name":"s","type":"string"},
      |{"name":"flag","type":"boolean"},
      |{"name":"d","type":"double"}]}""".stripMargin

  private def writeWithAvroLib(codec: Option[CodecFactory],
      n: Int): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    w.create(schema, bos)
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("v", if (i % 4 == 0) null else java.lang.Long.valueOf(i * 5L - 7))
      r.put("s", s"text$i")
      r.put("flag", i % 2 == 0)
      r.put("d", i.toDouble / 8)
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  private def check(bytes: Array[Byte], n: Int, codec: String): Unit = {
    val m = meta(bytes).get
    assert(m.codec == codec && m.nRecords == n.toLong)
    assert(m.fields.map(f => (f.name, f.tpe, f.nullable)) == Vector(
      ("id", "long", false), ("v", "long", true),
      ("s", "string", false), ("flag", "boolean", false),
      ("d", "double", false)))
    val rows = readRows(bytes).get
    assert(rows.length == n)
    (0 until n).foreach { i =>
      assert(rows(i)(0) == Some(i.toLong))
      assert(rows(i)(1) == (if (i % 4 == 0) None else Some(i * 5L - 7)))
      assert(rows(i)(2) == Some(s"text$i"))
      assert(rows(i)(3) == Some(i % 2 == 0))
      assert(rows(i)(4) == Some(i.toDouble / 8))
    }
  }

  test("avro-library null-codec file decodes natively") {
    check(writeWithAvroLib(None, 500), 500, "null")
  }

  test("avro-library deflate file decodes natively") {
    check(writeWithAvroLib(Some(CodecFactory.deflateCodec(6)), 500),
      500, "deflate")
  }

  test("[T,null] union order is honored from the schema") {
    val sj = """{"type":"record","name":"r","fields":[
      |{"name":"x","type":["long","null"]}]}""".stripMargin
    val schema = new Schema.Parser().parse(sj)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    Seq(java.lang.Long.valueOf(9L), null, java.lang.Long.valueOf(-3L))
      .foreach { v =>
        val r = new GenericData.Record(schema)
        r.put("x", v)
        w.append(r)
      }
    w.close()
    val rows = readRows(bos.toByteArray).get
    assert(rows.map(_.head) == Vector(Some(9L), None, Some(-3L)))
  }

  test("per-block sync markers are verified") {
    val good = writeWithAvroLib(None, 100)
    val bad = good.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x7).toByte // inside sync
    assert(readRows(bad).isEmpty)
  }

  test("total on garbage, truncation, nested schemas out of scope") {
    assert(readRows(null).isEmpty)
    assert(readRows("Obj not avro".getBytes).isEmpty)
    val good = writeWithAvroLib(None, 50)
    assert(readRows(java.util.Arrays.copyOfRange(good, 0, good.length - 9)).isEmpty)
    // nested schema → None (scope fence, not a crash)
    val nested = new Schema.Parser().parse(
      """{"type":"record","name":"o","fields":[
        |{"name":"a","type":{"type":"array","items":"long"}}]}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](nested))
    w.create(nested, bos)
    val r = new GenericData.Record(nested)
    r.put("a", List(java.lang.Long.valueOf(1L)).asJava)
    w.append(r)
    w.close()
    assert(readRows(bos.toByteArray).isEmpty)
  }

  test("logical types decode to their meaning; unknown ones fence out") {
    // library-written file with decimal(12,2)/date/timestamp-micros —
    // the schema shapes AvroTables.write emits
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"row","fields":[
        |{"name":"amt","type":{"type":"bytes","logicalType":"decimal",
        | "precision":12,"scale":2}},
        |{"name":"d","type":["null",{"type":"int","logicalType":"date"}]},
        |{"name":"ts","type":{"type":"long",
        | "logicalType":"timestamp-micros"}}]}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, bos)
    val r = new GenericData.Record(schema)
    // -0.01 → unscaled -1: the sign-extension path
    r.put("amt", java.nio.ByteBuffer.wrap(
      new java.math.BigDecimal("-0.01").unscaledValue().toByteArray))
    r.put("d", java.lang.Integer.valueOf(
      java.time.LocalDate.of(2020, 1, 2).toEpochDay.toInt))
    r.put("ts", java.lang.Long.valueOf(-999999L)) // pre-epoch micros
    w.append(r)
    val r2 = new GenericData.Record(schema)
    r2.put("amt", java.nio.ByteBuffer.wrap(
      new java.math.BigDecimal("12345.67").unscaledValue().toByteArray))
    r2.put("d", null)
    r2.put("ts", java.lang.Long.valueOf(1577934245123456L))
    w.append(r2)
    w.close()
    val bytes = bos.toByteArray
    val m = meta(bytes).get
    assert(m.fields.map(f => (f.name, f.tpe, f.nullable)) == Vector(
      ("amt", "decimal:2", false), ("d", "date", true),
      ("ts", "timestamp-micros", false)))
    val rows = readRows(bytes).get
    assert(rows(0) == Vector(
      Some(new java.math.BigDecimal("-0.01")),
      Some(java.time.LocalDate.of(2020, 1, 2)),
      Some(java.time.Instant.ofEpochSecond(-1L, 1000L))))
    assert(rows(1)(0) == Some(new java.math.BigDecimal("12345.67")))
    assert(rows(1)(1) == None)
    assert(rows(1)(2) ==
      Some(java.time.Instant.ofEpochSecond(1577934245L, 123456000L)))
    // an unknown logical type is out of scope — None, never a misread
    val unknown = new Schema.Parser().parse(
      """{"type":"record","name":"row","fields":[
        |{"name":"t","type":{"type":"int","logicalType":"time-millis"}}]}"""
        .stripMargin)
    val bos2 = new java.io.ByteArrayOutputStream()
    val w2 = new DataFileWriter(new GenericDatumWriter[GenericRecord](unknown))
    w2.create(unknown, bos2)
    val ur = new GenericData.Record(unknown)
    ur.put("t", java.lang.Integer.valueOf(1234))
    w2.append(ur)
    w2.close()
    assert(readRows(bos2.toByteArray).isEmpty)
  }
}

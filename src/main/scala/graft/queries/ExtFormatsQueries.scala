package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

import graft.queries.QueryUtil.{Q, scratchDir, tokRe}

/** serialization formats: parquet footer/pages, ORC, Avro OCF +
  * logical types, Arrow IPC, protobuf, CBOR, TFRecord, ZIP/TAR,
  * PDF/DOCX/XLSX document text.
  *
  * One tier of the [[ExtQueries]] registry (split per registry tier so
  * no single file carries the whole 200-query surface); entries and
  * oracle SQL are verbatim registry members composed back together in
  * [[ExtQueries]].
  */
object ExtFormatsQueries {

  val queries: Map[String, Q] = Map(

    // ── REAL PDF text extraction (the densest document format a crawl
    // carries): each doc's text rides a spec-valid PDF encode→extract
    // round trip, ids rotating the file shape — classic-xref/plain,
    // classic-xref/Flate with kerned TJ arrays, and xref-stream +
    // object-stream (the post-1.5 producer layout, PNG predictor 12 on
    // the index) with two content streams per page; every 5th doc's
    // last page arrives as an incremental update (/Prev chain). The
    // extractor must reassemble the exact text through deflate, the
    // object grammar, and the text operators. Per-page split points are
    // JVM substring arithmetic, so the oracle only needs page count +
    // full text; PdfCodecSpec pins the grammar corners (hex strings,
    // octal escapes, indirect /Length, UTF-16BE titles).
    "q166_pdf_text" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val nPages = (id % 4 + 1).toInt
          val cuts = (0 to nPages).map(i => text.length * i / nPages)
          val pages = (0 until nPages).map(i => text.substring(cuts(i), cuts(i + 1)))
          val bytes = (id % 3) match {
            case 0 if id % 5 == 0 && nPages >= 2 =>
              graft.functions.PdfCodec.appendPage(
                graft.functions.PdfCodec.encode(pages.init, flate = false),
                pages.last)
            case 0 => graft.functions.PdfCodec.encode(pages, flate = false)
            case 1 => graft.functions.PdfCodec.encode(pages, flate = true,
              kerned = true)
            case _ => graft.functions.PdfCodec.encode(pages, flate = true,
              xrefStream = true, twoStreamsPerPage = true)
          }
          val got = graft.functions.PdfCodec.extractText(bytes)
          (id, got.nPages.toLong, got.pages.mkString)
        }
        .toDF("doc_id", "n_pages", "text_out")
    },

    // ── ZIP central-directory walk: each doc's text split over
    // k=id%4+1 members (store arm on even ids, deflate on odd) and
    // read back through OUR EOCD→central-directory→local-header parse
    // with per-member CRC verification; total size must re-add to the
    // text length and every member must verify.
    "q175_zip_roundtrip" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val members = (0 until k).map(i =>
            s"m$i" -> text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val zip = graft.functions.ZipCodec.zipBytes(members, store = id % 2 == 0)
          val got = graft.functions.ZipCodec.readAll(zip)
          val okCrc = got.length == k &&
            got.zip(members).forall { case ((gn, gd), (mn, md)) =>
              gn == mn && java.util.Arrays.equals(gd, md)
            }
          (id, got.length.toLong, got.map(_._1).mkString(","),
            graft.functions.ZipCodec.entries(zip).map(_.size).sum, okCrc)
        }
        .toDF("doc_id", "n_entries", "names", "total_size", "ok_crc")
    },

    // ── DOCX text extraction: each doc's text rides a structurally
    // valid OOXML package (content types, rels, document part) split
    // into id%3+1 <w:p> paragraphs, and comes back newline-joined,
    // byte-exact, through the ZIP walk + WordprocessingML text rule.
    "q176_docx_text" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val n = (id % 3 + 1).toInt
          val cuts = (0 to n).map(i => text.length * i / n)
          val paras = (0 until n).map(i => text.substring(cuts(i), cuts(i + 1)))
          val docx = graft.functions.OfficeText.docxBytes(paras)
          (id, n.toLong,
            graft.functions.OfficeText.docxText(docx).getOrElse(""))
        }
        .toDF("doc_id", "n_paras", "text_out")
    },

    // ── XLSX cell extraction: per doc a real SpreadsheetML package —
    // k=id%3+1 rows × m=id%2+2 string columns through a REAL
    // shared-string table plus one untyped numeric column — read back
    // cell-exact through the zip walk + sheet/sst parse. One output
    // row per cell; the oracle rebuilds the grid with range joins.
    "q177_xlsx_cells" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id")))
        .as[Long]
        .flatMap { id =>
          val k = (id % 3 + 1).toInt
          val m = (id % 2 + 2).toInt
          val cells = for (r <- 0 until k; c <- 0 until m) yield
            (r, c, s"c${r}_${c}_$id", false)
          val numeric = (0 until k).map(r => (r, m, (id * 10 + r).toString, true))
          val xlsx = graft.functions.OfficeText.xlsxBytes(cells ++ numeric)
          graft.functions.OfficeText.xlsxCells(xlsx).map(cell =>
            (id, cell.row.toLong, cell.col.toLong, cell.value))
        }
        .toDF("doc_id", "row", "col", "value")
    },

    // ── TAR/ustar archive walk: per doc a real tar of k=id%4+1 text
    // slices (member 0 takes a >100-byte name when id%6==0, carried by
    // the GNU 'L' longname arm when id%4==0 and the pax 'x' path arm
    // otherwise), gzip-wrapped into a .tar.gz when id%2==0 — walked
    // back through gunzip → checksum-verified block walk. Names,
    // sizes, mtimes and a byte-exact payload roundtrip flag are under
    // the hash gate.
    "q179_tar_walk" -> { (s, dir) =>
      import s.implicits._
      graft.core.Partitioning.forCompute(Tables.documents(s, dir)
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val name0 = if (id % 6 == 0) ("p" * 104) + "/m0" else "m0"
          val members = (0 until k).map { i =>
            val nm = if (i == 0) name0 else s"m$i"
            (nm, text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
              id * 100 + i)
          }
          val tar = graft.functions.TarCodec.tarBytes(members,
            gnuLong = id % 4 == 0)
          val payload =
            if (id % 2 == 0) graft.functions.TarCodec.gzip(tar) else tar
          val raw =
            if (id % 2 == 0)
              graft.functions.TarCodec.gunzip(payload)
                .getOrElse(Array.emptyByteArray)
            else payload
          val es = graft.functions.TarCodec.entries(raw)
            .getOrElse(Vector.empty)
          val back = graft.functions.TarCodec.readAll(raw)
          val ok = back.length == k &&
            back.zip(members).forall { case ((gn, gd), (mn, md, _)) =>
              gn == mn && java.util.Arrays.equals(gd, md)
            }
          (id, es.length.toLong, es.map(_.name).mkString(","),
            es.map(_.size).sum, es.map(_.mtime).sum, ok)
        }
        .toDF("doc_id", "n_members", "names", "total_size",
          "sum_mtime", "ok_roundtrip")
    },

    // ── Parquet footer decode: Spark WRITES a real parquet file, then
    // the raw bytes are walked back through our own Thrift
    // compact-protocol FileMetaData parse — schema, per-chunk value
    // counts, null counts, min/max statistics — and the oracle
    // recomputes every one of those facts FROM THE DATA. parquet-mr's
    // written statistics sit between the two, so a slip in the zigzag/
    // varint/field-delta walk or the plain-encoded stat decode breaks
    // the hash. This is the engine's data-skipping layer made
    // inspectable: O(footer) per file, no column pages touched.
    "q181_parquet_footer" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_pqf_q181") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 3 - 500).as("v"),
          col("source").as("s"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      s.read.format("binaryFile").load(tmp + "/part-*.parquet")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.ParquetFooter.footer(bytes).toSeq.flatMap { fm =>
            fm.rowGroups.flatMap(_.columns)
              .groupBy(c => (c.path, c.physicalType))
              .toSeq.map { case ((path, pt), chunks) =>
                val mins = chunks.flatMap(c => c.minValue.flatMap(
                  graft.functions.ParquetFooter.statAsLong(pt, _)))
                val maxs = chunks.flatMap(c => c.maxValue.flatMap(
                  graft.functions.ParquetFooter.statAsLong(pt, _)))
                (path, pt, chunks.map(_.numValues).sum,
                  chunks.flatMap(_.nullCount).sum,
                  if (mins.nonEmpty) Some(mins.min) else None,
                  if (maxs.nonEmpty) Some(maxs.max) else None)
              }
          }
        }
        .toDF("col_name", "physical_type", "num_values", "null_count",
          "min_v", "max_v")
    },

    // ── protobuf wire-format walk: per doc a real message — varint,
    // zigzag sint, fixed64, string, PACKED repeated varints, and a
    // nested message — encoded and schema-lessly decoded back. Every
    // wire type is on the hash gate.
    "q182_proto_fields" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          import graft.functions.ProtoWire._
          val msg = encode(Seq(
            Field(1, VInt(id)),
            string(2, text.take((id % 20 + 5).toInt)),
            sint(3, -(id + 1)),
            Field(4, Fixed64(id * 1000 + 7)),
            packed(5, Seq(id % 10, id % 100, id % 1000)),
            message(6, Seq(Field(1, VInt(id % 256)),
              string(2, "n" + (id % 7))))))
          val fs = decode(msg).get
          val byNo = fs.groupBy(_.number)
          val title = utf8(byNo(2).head.value.asInstanceOf[Chunk])
          val zz = zigzag(byNo(3).head.value.asInstanceOf[VInt].v)
          val f4 = byNo(4).head.value.asInstanceOf[Fixed64].v
          val psum = packedVarints(
            byNo(5).head.value.asInstanceOf[Chunk]).get.sum
          val inner = nested(byNo(6).head.value.asInstanceOf[Chunk]).get
          (id, byNo(1).head.value.asInstanceOf[VInt].v, title, zz, f4,
            psum, inner(0).value.asInstanceOf[VInt].v,
            utf8(inner(1).value.asInstanceOf[Chunk]))
        }
        .toDF("doc_id", "v1", "title", "zz", "f4", "packed_sum",
          "nested_v", "nested_s")
    },

    // ── CBOR document decode: per doc a real RFC 8949 item — map with
    // int/negint/text/array/bool/float64 members — encoded
    // deterministically; id%4==0 re-frames it through the
    // INDEFINITE-LENGTH array arm (0x9f…0xff) so the streaming
    // framing is on the oracled path too.
    "q183_cbor_doc" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          import graft.functions.CborCodec._
          val nTags = (id % 3 + 1).toInt
          val doc = CMap(Vector(
            CText("id") -> CInt(id),
            CText("neg") -> CInt(-id - 1),
            CText("title") -> CText(text.take((id % 15 + 3).toInt)),
            CText("tags") -> CArr(Vector.tabulate(nTags)(i =>
              CText("t" + ((id + i) % 5)))),
            CText("flag") -> CBool(id % 2 == 0),
            CText("score") -> CFloat((id % 1000) * 0.25)))
          val payload =
            if (id % 4 == 0) encodeIndefiniteArr(Seq(doc))
            else encode(doc)
          val back = decode(payload).get match {
            case CArr(Vector(m: CMap)) => m
            case m: CMap => m
            case _ => CMap(Vector.empty)
          }
          val kv = back.v.collect { case (CText(k), v) => k -> v }.toMap
          (id,
            kv("id").asInstanceOf[CInt].v,
            kv("neg").asInstanceOf[CInt].v,
            kv("title").asInstanceOf[CText].v,
            kv("tags").asInstanceOf[CArr].v.length.toLong,
            kv("tags").asInstanceOf[CArr].v.collect {
              case CText(t) => t }.mkString(","),
            kv("flag").asInstanceOf[CBool].v,
            kv("score").asInstanceOf[CFloat].v)
        }
        .toDF("doc_id", "id_v", "neg_v", "title", "n_tags", "tags",
          "flag", "score")
    },

    // ── TFRecord framing: per doc a real record archive of k=id%3+1
    // text slices, both CRC32Cs verified on the walk back; id%11==0
    // additionally flips one payload byte in a COPY and the gate
    // swears the damaged archive is rejected — the torn-write
    // detection the format exists for, on the oracled path.
    "q184_tfrecord" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 3 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val recs = (0 until k).map(i =>
            text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val archive = graft.functions.TfRecordCodec.write(recs)
          val back = graft.functions.TfRecordCodec.records(archive)
            .getOrElse(Vector.empty)
          val ok = back.length == k &&
            back.zip(recs).forall { case (g, w) =>
              java.util.Arrays.equals(g, w)
            }
          val rejected =
            if (id % 11 == 0 && archive.length > 14) {
              val bad = archive.clone()
              bad(12) = (bad(12) ^ 0x01).toByte
              graft.functions.TfRecordCodec.records(bad).isEmpty
            } else false
          (id, back.length.toLong, back.map(_.length.toLong).sum, ok,
            rejected)
        }
        .toDF("doc_id", "n_records", "total_bytes", "ok_roundtrip",
          "rejected_on_damage")
    },

    // ── parquet data-PAGE decode (the read path, not just the
    // footer): Spark writes a SNAPPY parquet file (the default codec,
    // through our own raw-block decompressor) of (doc_id, v, flag)
    // and the raw bytes are walked back to ROWS through our own page
    // decode — Thrift page headers, snappy inflate per page, RLE/
    // bit-packed definition levels on the OPTIONAL column, dictionary
    // + PLAIN value encodings, bit-packed BOOLEAN — and the oracle is
    // simply the source table. A slip anywhere in the page grammar
    // or the snappy tag grammar changes rows and breaks the hash.
    "q185_parquet_pages" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_pqp_q185") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 7 + 1).as("v"),
          (col("doc_id") % 3 === 0).as("flag"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(tmp)
      s.read.format("binaryFile").load(tmp + "/part-*.parquet")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          val ids = graft.functions.ParquetPages
            .readInt64Column(bytes, "doc_id").get
          val vs = graft.functions.ParquetPages
            .readInt64Column(bytes, "v").get
          val fs = graft.functions.ParquetPages
            .readColumn(bytes, "flag").get
          ids.indices.map { i =>
            (ids(i).get, vs(i), fs(i).map(_.asInstanceOf[Boolean]))
          }
        }
        .toDF("doc_id", "v", "flag")
    },

    // ── ORC footer walk: Spark writes a zlib ORC file and the raw
    // tail is decoded back through PostScript → chunked raw-deflate
    // inflate → protobuf Footer — type tree, stripe rows, per-column
    // statistics (ORC's non-null numberOfValues convention, zigzag
    // sint64 min/max/sum incl. negatives) — all recomputed from the
    // data by the oracle.
    "q186_orc_footer" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_orc_q186") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 2 - 300).as("v"),
          col("source").as("s"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "zlib").orc(tmp)
      s.read.format("binaryFile").load(tmp + "/*.orc")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.OrcFooter.footer(bytes).toSeq.flatMap { m =>
            m.columns.map { c =>
              (c.name, c.kind, c.numValues, c.hasNull,
                c.intMin, c.intMax, c.intSum, m.numRows,
                m.stripeRows.sum)
            }
          }
        }
        .toDF("col_name", "kind", "num_values", "has_null", "int_min",
          "int_max", "int_sum", "n_rows", "stripe_rows")
    },

    // ── Avro OCF native read: the REFERENCE avro library writes the
    // container (via sources.AvroTables); our dependency-free walk —
    // metadata map, schema JSON parse, zigzag/length-prefixed binary
    // records, per-block sync verification — decodes it back to ROWS,
    // and the oracle is the source table. Cross-engine in the
    // opposite direction from q185 (library writer, native reader).
    "q188_avro_ocf" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_avro_q188") + "/t"
      graft.sources.AvroTables.write(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            when(col("doc_id") % 6 === 0, lit(null).cast("long"))
              .otherwise(col("doc_id") * 11 - 40).as("v"),
            (col("doc_id") % 4 === 0).as("flag"))
          .coalesce(1),
        tmp)
      s.read.format("binaryFile").load(tmp + "/*.avro")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.AvroOcf.readRows(bytes)
            .getOrElse(Vector.empty)
            .map { r =>
              (r(0).get.asInstanceOf[Long],
                r(1).map(_.asInstanceOf[Long]),
                r(2).map(_.asInstanceOf[Boolean]))
            }
        }
        .toDF("doc_id", "v", "flag")
    },

    // ── Arrow IPC native read: per PARTITION the arrow reference
    // library (arrow-java, the Spark classpath's pandas-UDF interop
    // dependency) writes a real IPC file in memory, and our own
    // flatbuffers walk — vtables, unions, Block index, validity
    // bitmaps, offset+data Utf8 — decodes it back to rows inside the
    // same scan stage. Library writer → native reader, the q188
    // direction, for the format ML loaders actually exchange.
    "q189_arrow_ipc" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 8 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 13 + 5).as("v"),
          concat(lit("t"), (col("doc_id") % 9).cast("string")).as("s"))
        .as[(Long, Option[Long], String)]
        .mapPartitions { rows =>
          val buf = rows.toVector
          if (buf.isEmpty) Iterator.empty
          else {
            import org.apache.arrow.vector._
            import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
            import scala.jdk.CollectionConverters._
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val schema = new Schema(List(
              new Field("doc_id", FieldType.notNullable(
                new ArrowType.Int(64, true)), null),
              new Field("v", FieldType.nullable(
                new ArrowType.Int(64, true)), null),
              new Field("s", FieldType.nullable(
                new ArrowType.Utf8()), null)).asJava)
            val root = VectorSchemaRoot.create(schema, alloc)
            val bos = new java.io.ByteArrayOutputStream()
            val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(
              root, null, java.nio.channels.Channels.newChannel(bos))
            w.start()
            root.allocateNew()
            val idV = root.getVector("doc_id").asInstanceOf[BigIntVector]
            val vV = root.getVector("v").asInstanceOf[BigIntVector]
            val sV = root.getVector("s").asInstanceOf[VarCharVector]
            buf.zipWithIndex.foreach { case ((id, v, str), r) =>
              idV.setSafe(r, id)
              v match {
                case Some(x) => vV.setSafe(r, x)
                case None => vV.setNull(r)
              }
              sV.setSafe(r, str.getBytes("UTF-8"))
            }
            root.setRowCount(buf.length)
            w.writeBatch()
            w.end(); w.close(); root.close(); alloc.close()
            graft.functions.ArrowIpc.readRows(bos.toByteArray)
              .getOrElse(Vector.empty)
              .iterator
              .map { r =>
                (r(0).get.asInstanceOf[Long],
                  r(1).map(_.asInstanceOf[Long]),
                  r(2).map(_.asInstanceOf[String]))
              }
          }
        }
        .toDF("doc_id", "v", "s")
    },

    // ── Avro logical types under the oracle: lineitem's price/date/
    // timestamp ride through a REAL Avro container round-trip as
    // decimal(12,2) (two's-complement unscaled bytes), date (epoch
    // days on int), and timestamp-micros (epoch micros on long) — the
    // spec's annotations, interoperable with spark-avro — and the
    // year-grain rollup of what comes BACK must equal DuckDB computing
    // the same from the source parquet. Decimal sums stay exact until
    // the final double cast; the timestamp surfaces as a formatted
    // UTC string (validate's native-arrow output set).
    "q210_avro_logical_types" -> { (s, dir) =>
      val out = scratchDir("graft_avro_q210") + "/t"
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_shipdate").cast("timestamp").as("ship_ts"))
      // forCompute, not coalesce(4): lineitem arrives as ONE parquet
      // split, and coalesce can only shrink — the whole Avro encode ran
      // as a single task (r18; file count is irrelevant to the gate,
      // which aggregates the read-back)
      graft.sources.AvroTables.write(
        graft.core.Partitioning.forCompute(li), out)
      graft.sources.AvroTables.read(s, out)
        .groupBy(year(col("ship_date")).cast("long").as("ship_year"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"),
          max(col("ship_date")).as("max_date"),
          date_format(max(col("ship_ts")), "yyyy-MM-dd HH:mm:ss")
            .as("max_ts"))
    },
  )

  private[queries] val oracleBase: Map[String, String] = Map(

    // extraction identity: the text must come back byte-exact through
    // the PDF encode→extract round trip; page splits are substring
    // arithmetic, so concatenation restores the original exactly
    "q166_pdf_text" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_pages,
        |  text AS text_out
        |FROM documents""".stripMargin,

    // central-directory identity: member census + exact size re-add
    "q175_zip_roundtrip" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_entries,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'm0'
        |    WHEN 1 THEN 'm0,m1'
        |    WHEN 2 THEN 'm0,m1,m2'
        |    ELSE 'm0,m1,m2,m3' END AS names,
        |  CAST(length(text) AS BIGINT) AS total_size,
        |  true AS ok_crc
        |FROM documents""".stripMargin,

    // OOXML identity: substring-arithmetic paragraph cuts rejoined
    // with the newline the paragraph boundary maps to
    "q176_docx_text" ->
      """SELECT doc_id,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_paras,
        |  CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN text
        |    WHEN 1 THEN substring(text, 1, length(text) // 2) || chr(10) ||
        |      substring(text, length(text) // 2 + 1)
        |    ELSE substring(text, 1, length(text) // 3) || chr(10) ||
        |      substring(text, length(text) // 3 + 1,
        |        (2 * length(text)) // 3 - length(text) // 3) || chr(10) ||
        |      substring(text, (2 * length(text)) // 3 + 1)
        |  END AS text_out
        |FROM documents""".stripMargin,

    // grid identity: string cells by formula, the extra numeric column
    "q177_xlsx_cells" ->
      """SELECT d.doc_id, CAST(r.i AS BIGINT) AS row,
        |  CAST(c.i AS BIGINT) AS col,
        |  'c' || r.i || '_' || c.i || '_' || d.doc_id AS value
        |FROM documents d
        |JOIN range(0, 3) r(i) ON r.i < d.doc_id % 3 + 1
        |JOIN range(0, 3) c(i) ON c.i < d.doc_id % 2 + 2
        |UNION ALL
        |SELECT d.doc_id, CAST(r.i AS BIGINT) AS row,
        |  CAST(d.doc_id % 2 + 2 AS BIGINT) AS col,
        |  CAST(d.doc_id * 10 + r.i AS VARCHAR) AS value
        |FROM documents d
        |JOIN range(0, 3) r(i) ON r.i < d.doc_id % 3 + 1""".stripMargin,

    // archive identity: names/sizes/mtimes recomputed arithmetically;
    // the Spark side must recover them through a real ustar write →
    // (gzip →) checksum-verified block walk
    "q179_tar_walk" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_members,
        |  (CASE WHEN doc_id % 6 = 0 THEN repeat('p', 104) || '/m0'
        |        ELSE 'm0' END)
        |  || (CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN '' WHEN 1 THEN ',m1'
        |      WHEN 2 THEN ',m1,m2' ELSE ',m1,m2,m3' END) AS names,
        |  CAST(length(text) AS BIGINT) AS total_size,
        |  CAST((doc_id % 4 + 1) * (doc_id * 100)
        |     + ((doc_id % 4 + 1) * (doc_id % 4)) // 2 AS BIGINT)
        |    AS sum_mtime,
        |  true AS ok_roundtrip
        |FROM documents""".stripMargin,

    // statistics identity: the footer's written stats vs the same
    // facts recomputed from the data — the Spark side must recover
    // them through a real Thrift compact-protocol decode
    "q181_parquet_footer" ->
      """WITH base AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       ELSE doc_id * 3 - 500 END AS v,
        |  source AS s FROM documents)
        |SELECT 'doc_id' AS col_name, 'INT64' AS physical_type,
        |  CAST(COUNT(*) AS BIGINT) AS num_values,
        |  CAST(0 AS BIGINT) AS null_count,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_v,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_v
        |FROM base
        |UNION ALL
        |SELECT 'v', 'INT64', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(v) AS BIGINT),
        |  CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 's', 'BYTE_ARRAY', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(s) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM base""".stripMargin,

    // wire identity: every field recomputed arithmetically; the Spark
    // side recovers them through a real encode → schema-less walk
    "q182_proto_fields" ->
      """SELECT doc_id,
        |  doc_id AS v1,
        |  substring(text, 1, CAST(doc_id % 20 + 5 AS INT)) AS title,
        |  -(doc_id + 1) AS zz,
        |  doc_id * 1000 + 7 AS f4,
        |  doc_id % 10 + doc_id % 100 + doc_id % 1000 AS packed_sum,
        |  doc_id % 256 AS nested_v,
        |  'n' || (doc_id % 7) AS nested_s
        |FROM documents""".stripMargin,

    "q183_cbor_doc" ->
      """SELECT doc_id,
        |  doc_id AS id_v,
        |  -doc_id - 1 AS neg_v,
        |  substring(text, 1, CAST(doc_id % 15 + 3 AS INT)) AS title,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_tags,
        |  't' || (doc_id % 5) ||
        |    CASE WHEN doc_id % 3 >= 1
        |      THEN ',t' || ((doc_id + 1) % 5) ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 2
        |      THEN ',t' || ((doc_id + 2) % 5) ELSE '' END AS tags,
        |  doc_id % 2 = 0 AS flag,
        |  CAST(doc_id % 1000 AS DOUBLE) * 0.25 AS score
        |FROM documents""".stripMargin,

    // framing identity incl. the NEGATIVE arm: a flipped payload byte
    // must be rejected by the CRC walk on every 11th doc
    "q184_tfrecord" ->
      """SELECT doc_id,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_records,
        |  CAST(length(text) AS BIGINT) AS total_bytes,
        |  true AS ok_roundtrip,
        |  doc_id % 11 = 0 AS rejected_on_damage
        |FROM documents""".stripMargin,

    // read-path identity: rows decoded byte-level from a real parquet
    // file must equal the source table
    "q185_parquet_pages" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN NULL
        |       ELSE doc_id * 7 + 1 END AS v,
        |  doc_id % 3 = 0 AS flag
        |FROM documents""".stripMargin,

    // statistics identity on the ORC side: footer stats vs the same
    // facts recomputed from the data (numberOfValues = NON-null)
    "q186_orc_footer" ->
      """WITH base AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE doc_id * 2 - 300 END AS v,
        |  source AS s FROM documents)
        |SELECT 'doc_id' AS col_name, 'LONG' AS kind,
        |  CAST(COUNT(*) AS BIGINT) AS num_values, false AS has_null,
        |  CAST(MIN(doc_id) AS BIGINT) AS int_min,
        |  CAST(MAX(doc_id) AS BIGINT) AS int_max,
        |  CAST(SUM(doc_id) AS BIGINT) AS int_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS stripe_rows
        |FROM base
        |UNION ALL
        |SELECT 'v', 'LONG', CAST(COUNT(v) AS BIGINT),
        |  COUNT(*) > COUNT(v),
        |  CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT),
        |  CAST(SUM(v) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 's', 'STRING', CAST(COUNT(s) AS BIGINT),
        |  COUNT(*) > COUNT(s),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        |FROM base""".stripMargin,

    // read-path identity, library writer → native reader
    "q188_avro_ocf" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 0 THEN NULL
        |       ELSE doc_id * 11 - 40 END AS v,
        |  doc_id % 4 = 0 AS flag
        |FROM documents""".stripMargin,

    "q189_arrow_ipc" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 8 = 0 THEN NULL
        |       ELSE doc_id * 13 + 5 END AS v,
        |  't' || (doc_id % 9) AS s
        |FROM documents""".stripMargin,
  )
}

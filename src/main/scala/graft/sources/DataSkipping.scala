package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level min/max statistics and the conservative pruning logic
  * over them — the data-skipping half of [[TxLogTable]] (the public
  * Delta/Iceberg idea: the manifest that makes a file visible also
  * records, per file, the value range of chosen columns, so a reader
  * with a selective predicate plans from KILOBYTES of ranges instead
  * of listing-and-scanning every file).
  *
  * Why this matters at 100 TB: parquet row-group statistics only help
  * AFTER a task has been scheduled against the file — every file still
  * costs a footer read and a task. Manifest-level ranges cut files
  * before planning, so a time-ranged query over an append-mostly table
  * (the dominant shape of an events/corpus store) schedules work
  * proportional to the MATCHED range, not to table history. Paired
  * with [[TxLogTable.compactClustered]] (range-repartition by the
  * skipping columns), file ranges become disjoint and pruning
  * approaches partition-pruning effectiveness without hive-style
  * directory explosion.
  *
  * Soundness contract: `mayMatch` answers "could any row of a file
  * with these ranges satisfy the predicate" and errs toward TRUE —
  * every unsupported expression node, missing column, type mismatch,
  * or absent stat keeps the file. The caller re-applies the full
  * predicate after the scan, so pruning can never change results,
  * only skip provably-irrelevant files.
  *
  * Values are stored as canonical strings (JSON-manifest friendly):
  * integrals/boolean as decimal longs, date as epoch days, timestamps
  * as epoch micros, float/double via `Double.toString` (round-trips
  * exactly), decimals as plain strings, strings raw. String order is
  * CODE-POINT order — the same binary UTF-8 ordering Spark's min/max
  * computed the stats under (java.lang.String's UTF-16 comparison
  * disagrees for supplementary-plane text, the exact trap NUMERICS.md
  * records for q102's stratum sort).
  */
object DataSkipping {

  /** Range of one column within one file. `min`/`max` are None only
    * when every value in the file is null.
    */
  case class ColRange(min: Option[String], max: Option[String], nulls: Long)

  /** Per-file statistics: total rows + per-column ranges, plus
    * optional per-column Bloom filters (`blooms`: column → Base64 of a
    * serialized `org.apache.spark.util.sketch.BloomFilter` over
    * `xxhash64` of the canonicalized value — see [[bloomHash]]).
    * Ranges prune RANGE predicates (after clustering); blooms prune
    * POINT lookups on high-cardinality columns whose per-file ranges
    * span the key space (the append-ordered id column every corpus
    * store has). `thetas` holds Base64 compact Theta sketches of each
    * stats column's distinct values (lgK=9) — per-file sketches UNION
    * soundly across files, which is how the table-level NDV the
    * cost-based optimizer needs ([[TxLogTable.statsSummaryAt]]) is
    * recovered without a second scan; per-file counts alone cannot be
    * combined. Old manifests deserialize with `blooms`/`thetas` empty.
    */
  case class FileStats(rows: Long, cols: Map[String, ColRange],
      blooms: Map[String, String] = Map.empty,
      thetas: Map[String, String] = Map.empty)

  /** Comparison domain a column's stats live in. */
  private[sources] sealed trait Kind
  private[sources] case object KLong extends Kind
  private[sources] case object KDouble extends Kind
  private[sources] case object KDecimal extends Kind
  private[sources] case object KString extends Kind

  /** Type family tag: a literal may only be compared against stats of
    * the SAME family (comparing epoch-day ints against raw longs, or a
    * tz-timestamp against an ntz one, would prune wrongly).
    */
  private def family(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("int")
    case BooleanType => Some("bool")
    case DateType => Some("date")
    case TimestampType => Some("ts")
    case TimestampNTZType => Some("tsntz")
    case FloatType | DoubleType => Some("fp")
    case _: DecimalType => Some("dec")
    case _: StringType => Some("str")
    case _ => None
  }

  private def kindOf(dt: DataType): Option[Kind] = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         DateType | TimestampType | TimestampNTZType => Some(KLong)
    case FloatType | DoubleType => Some(KDouble)
    case _: DecimalType => Some(KDecimal)
    case _: StringType => Some(KString)
    case _ => None
  }

  /** Can stats be collected/used for a column of this type? */
  def supported(dt: DataType): Boolean = kindOf(dt).isDefined

  /** Can a Bloom filter be collected/consulted for this type? Integral
    * and string only: both sides hash through ONE canonical form
    * (integrals cast to long, strings raw — [[bloomHash]] must produce
    * exactly the value the writer's `xxhash64` aggregate hashed, and
    * Spark's xxhash64 output differs by input TYPE, so the writer
    * casts too). Floats/decimals are poor point-lookup keys anyway.
    */
  def bloomSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | _: StringType => true
    case _ => false
  }

  /** xxhash64(seed 42) of a catalyst literal in the writer's canonical
    * form: integrals as LONG, strings as UTF8String — the exact
    * expression [[graft.sources.TxLogTable]]'s bloom aggregate hashes
    * (`xxhash64(col.cast("long"))` / `xxhash64(col)`).
    */
  private[sources] def bloomHash(value: Any, dt: DataType): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    val canon: Option[Literal] = (dt, value) match {
      case (_, null) => None
      case (ByteType, v: Byte) => Some(Literal(v.toLong, LongType))
      case (ShortType, v: Short) => Some(Literal(v.toLong, LongType))
      case (IntegerType, v: Int) => Some(Literal(v.toLong, LongType))
      case (LongType, v: Long) => Some(Literal(v, LongType))
      case (_: StringType, s: UTF8String) => Some(Literal(s, StringType))
      case _ => None
    }
    canon.map(l => XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long])
  }

  private def bloomFor(attr: String, schema: StructType,
      fs: FileStats): Option[org.apache.spark.util.sketch.BloomFilter] =
    for {
      f <- schema.fields.find(_.name.equalsIgnoreCase(attr))
      b64 <- fs.blooms.get(f.name)
    } yield org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(b64)))

  /** Bloom leg of an equality test: false only when a filter EXISTS
    * for the column, the literal canonicalizes, and the filter says
    * definitely-absent. Anything missing keeps the file.
    */
  private def bloomMayContain(attr: String, lit: Literal,
      schema: StructType, fs: FileStats): Boolean =
    (for {
      bf <- bloomFor(attr, schema, fs)
      f <- schema.fields.find(_.name.equalsIgnoreCase(attr))
      if family(f.dataType) == family(lit.dataType)
      h <- bloomHash(lit.value, lit.dataType)
    } yield bf.mightContainLong(h)).getOrElse(true)

  /** Canonical string for an EXTERNAL (Row-level) value, as returned
    * by a min/max aggregate collected through the DataFrame API.
    */
  def encodeExternal(v: Any): Option[String] = v match {
    case null => None
    case b: Boolean => Some(if (b) "1" else "0")
    case b: Byte => Some(b.toString)
    case s: Short => Some(s.toString)
    case i: Int => Some(i.toString)
    case l: Long => Some(l.toString)
    case f: Float => Some(f.toDouble.toString)
    case d: Double => Some(d.toString)
    case s: String => Some(s)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case t: java.sql.Timestamp =>
      Some((t.getTime * 1000L + (t.getNanos / 1000L) % 1000L).toString)
    case i: java.time.Instant =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case l: java.time.LocalDateTime =>
      Some((l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        l.getNano / 1000L).toString)
    case _ => None
  }

  /** Human/Hive-facing spelling of an EXTERNAL stat string — the
    * inverse presentation of [[encodeExternal]] for surfaces that
    * print partition values (SHOW PARTITIONS): dates render as date
    * literals (not epoch days), timestamps as UTC datetime literals
    * (not micros), booleans as true/false; everything else is already
    * its literal spelling.
    */
  def externalToPartitionString(dt: DataType, ext: String): String =
    dt match {
      case DateType =>
        java.time.LocalDate.ofEpochDay(ext.toLong).toString
      case TimestampType | TimestampNTZType =>
        val micros = ext.toLong
        val secs = Math.floorDiv(micros, 1000000L)
        val nanos = Math.floorMod(micros, 1000000L) * 1000L
        java.time.LocalDateTime.ofEpochSecond(secs, nanos.toInt,
          java.time.ZoneOffset.UTC).toString.replace('T', ' ')
      case BooleanType => if (ext == "1") "true" else "false"
      case _ => ext
    }

  /** Canonical string for a CATALYST literal (internal representation:
    * UTF8String, epoch-day Int, epoch-micros Long, Decimal).
    */
  private def encodeLiteral(value: Any, dt: DataType): Option[String] =
    (dt, value) match {
      case (_, null) => None
      case (BooleanType, b: Boolean) => Some(if (b) "1" else "0")
      case (ByteType, v: Byte) => Some(v.toString)
      case (ShortType, v: Short) => Some(v.toString)
      case (IntegerType, v: Int) => Some(v.toString)
      case (LongType, v: Long) => Some(v.toString)
      case (DateType, d: Int) => Some(d.toLong.toString)
      case (TimestampType, m: Long) => Some(m.toString)
      case (TimestampNTZType, m: Long) => Some(m.toString)
      case (FloatType, f: Float) => Some(f.toDouble.toString)
      case (DoubleType, d: Double) => Some(d.toString)
      case (_: DecimalType, d: Decimal) => Some(d.toJavaBigDecimal.toPlainString)
      case (_: StringType, s: UTF8String) => Some(s.toString)
      case _ => None
    }

  /** Code-point lexicographic comparison — equals UTF-8 byte order,
    * i.e. the ordering Spark's string min/max used.
    */
  private[sources] def cmpCodePoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def cmp(kind: Kind, a: String, b: String): Int = kind match {
    case KLong => java.lang.Long.compare(a.toLong, b.toLong)
    case KDouble => java.lang.Double.compare(a.toDouble, b.toDouble)
    case KDecimal => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case KString => cmpCodePoints(a, b)
  }

  /** Resolved inputs for one (attribute op literal) test, or None when
    * anything needed is missing — in which case the file is kept.
    */
  private def resolve(attr: String, lit: Literal, schema: StructType,
      fs: FileStats): Option[(ColRange, Kind, String)] =
    for {
      f <- schema.fields.find(_.name.equalsIgnoreCase(attr))
      fam <- family(f.dataType)
      litFam <- family(lit.dataType)
      if fam == litFam
      k <- kindOf(f.dataType)
      r <- fs.cols.get(f.name)
      v <- encodeLiteral(lit.value, lit.dataType)
    } yield (r, k, v)

  /** Value-predicate template: false only when the stats PROVE no row
    * can match (`test` sees non-None min/max). All-null files fail any
    * value comparison; missing stats keep the file.
    */
  private def valueTest(attr: String, lit: Literal, schema: StructType,
      fs: FileStats)(test: (Kind, String, String, String) => Boolean): Boolean =
    resolve(attr, lit, schema, fs) match {
      case None => true
      case Some((r, k, v)) =>
        (r.min, r.max) match {
          case (Some(mn), Some(mx)) => test(k, mn, mx, v)
          case _ => false // every value in the file is null
        }
    }

  private def statsFor(attr: String, schema: StructType,
      fs: FileStats): Option[ColRange] =
    schema.fields.find(_.name.equalsIgnoreCase(attr))
      .flatMap(f => fs.cols.get(f.name))

  /** Smallest string strictly greater than every string with prefix
    * `p`, by incrementing the last code point; None when the prefix
    * ends in U+10FFFF (give up the upper bound, stay conservative).
    */
  private def prefixUpperBound(p: String): Option[String] = {
    if (p.isEmpty) return None
    val last = p.codePointBefore(p.length)
    if (last >= 0x10FFFF) None
    else Some(p.substring(0, p.length - Character.charCount(last)) +
      new String(Character.toChars(last + 1)))
  }

  /** Columns built through the DataFrame API arrive as catalyst
    * `UnresolvedFunction` nodes named after the operator ("=", "and",
    * "isNull", …) rather than the native predicate classes (those
    * appear only via `expr("…")` parsing). Rewrite the recognized
    * names to their native forms so one evaluator serves both
    * construction paths; unknown functions stay opaque (⇒ kept).
    */
  private def normalize(e: Expression): Expression = e.transformUp {
    case f: UnresolvedFunction
        if !f.isDistinct && f.filter.isEmpty =>
      (f.nameParts.map(_.toLowerCase).mkString("."), f.arguments) match {
        case ("and", Seq(a, b)) => And(a, b)
        case ("or", Seq(a, b)) => Or(a, b)
        case ("=" | "==" | "equalto", Seq(a, b)) => EqualTo(a, b)
        case ("<=>", Seq(a, b)) => EqualNullSafe(a, b)
        case ("<", Seq(a, b)) => LessThan(a, b)
        case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
        case (">", Seq(a, b)) => GreaterThan(a, b)
        case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
        case ("in", a +: rest) if rest.nonEmpty => In(a, rest)
        case ("not", Seq(a)) => Not(a)
        case ("isnull", Seq(a)) => IsNull(a)
        case ("isnotnull", Seq(a)) => IsNotNull(a)
        case ("startswith", Seq(a, b)) => StartsWith(a, b)
        case _ => f
      }
  }

  /** Typed comparison of two encoded stat strings of a column type —
    * the fold step for aggregating per-file ranges into TABLE-level
    * min/max (the CBO statistics surface). None when the type has no
    * stats domain.
    */
  private[sources] def cmpExternal(dt: DataType, a: String,
      b: String): Option[Int] = kindOf(dt).map(cmp(_, a, b))

  /** Could any row of a file with stats `fs` satisfy `e`? Conservative
    * three-valued evaluation: unsupported nodes answer true.
    */
  def mayMatch(e: Expression, schema: StructType, fs: FileStats): Boolean =
    eval(normalize(e), schema, fs)

  private def eval(e: Expression, schema: StructType, fs: FileStats): Boolean =
    e match {
      case And(l, r) => eval(l, schema, fs) && eval(r, schema, fs)
      case Or(l, r) => eval(l, schema, fs) || eval(r, schema, fs)

      case EqualTo(a: Attribute, l: Literal) => eqTest(a.name, l, schema, fs)
      case EqualTo(l: Literal, a: Attribute) => eqTest(a.name, l, schema, fs)
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        eqTest(a.name, l, schema, fs)
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null =>
        eqTest(a.name, l, schema, fs)

      case LessThan(a: Attribute, l: Literal) =>
        valueTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) < 0)
      case LessThan(l: Literal, a: Attribute) => // lit < col ≡ col > lit
        valueTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) > 0)
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        valueTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) <= 0)
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        valueTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) >= 0)
      case GreaterThan(a: Attribute, l: Literal) =>
        valueTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) > 0)
      case GreaterThan(l: Literal, a: Attribute) =>
        valueTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) < 0)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        valueTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) >= 0)
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        valueTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) <= 0)

      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => eqTest(a.name, v.asInstanceOf[Literal], schema, fs))

      case IsNull(a: Attribute) =>
        statsFor(a.name, schema, fs).forall(_.nulls > 0)
      case IsNotNull(a: Attribute) =>
        statsFor(a.name, schema, fs).forall(r => fs.rows - r.nulls > 0)

      case StartsWith(a: Attribute, l: Literal) =>
        valueTest(a.name, l, schema, fs) { (k, mn, mx, p) =>
          // s startsWith p  ⇒  p ≤ s < upperBound(p)
          cmp(k, mx, p) >= 0 &&
            prefixUpperBound(p).forall(ub => cmp(k, mn, ub) < 0)
        }

      case Literal(b: Boolean, BooleanType) => b

      case _ => true
    }

  private def eqTest(attr: String, l: Literal, schema: StructType,
      fs: FileStats): Boolean =
    valueTest(attr, l, schema, fs)((k, mn, mx, v) =>
      cmp(k, mn, v) <= 0 && cmp(k, mx, v) >= 0) &&
      bloomMayContain(attr, l, schema, fs)

  /** Does EVERY row of a file with stats `fs` provably satisfy `e`?
    * NULL counts as NOT satisfying (SQL WHERE semantics), so value
    * arms additionally require zero nulls. Conservative three-valued
    * evaluation: unsupported nodes answer false. This is the
    * replaceWhere verdict dual of [[mayMatch]] — a file is droppable
    * iff `mustMatch(pred)`, keepable iff `!mayMatch(pred)`, and
    * indeterminate (→ loud refusal) otherwise; conservatism on either
    * side can only produce refusals, never silent wrong verdicts.
    */
  def mustMatch(e: Expression, schema: StructType, fs: FileStats): Boolean =
    fs.rows == 0L || evalAll(normalize(e), schema, fs)

  private def evalAll(e: Expression, schema: StructType,
      fs: FileStats): Boolean = e match {
    case And(l, r) => evalAll(l, schema, fs) && evalAll(r, schema, fs)
    // every row satisfies (l OR r) if every row satisfies one side —
    // conservative: a row-wise mix across sides answers false
    case Or(l, r) => evalAll(l, schema, fs) || evalAll(r, schema, fs)

    case EqualTo(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, mn, mx, v) =>
        cmp(k, mn, v) == 0 && cmp(k, mx, v) == 0)
    case EqualTo(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, mn, mx, v) =>
        cmp(k, mn, v) == 0 && cmp(k, mx, v) == 0)
    case EqualNullSafe(a: Attribute, l: Literal) if l.value == null =>
      statsFor(a.name, schema, fs).exists(_.nulls == fs.rows)
    case EqualNullSafe(l: Literal, a: Attribute) if l.value == null =>
      statsFor(a.name, schema, fs).exists(_.nulls == fs.rows)
    case EqualNullSafe(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, mn, mx, v) =>
        cmp(k, mn, v) == 0 && cmp(k, mx, v) == 0)
    case EqualNullSafe(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, mn, mx, v) =>
        cmp(k, mn, v) == 0 && cmp(k, mx, v) == 0)

    case LessThan(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) < 0)
    case LessThan(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) > 0)
    case LessThanOrEqual(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) <= 0)
    case LessThanOrEqual(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) >= 0)
    case GreaterThan(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) > 0)
    case GreaterThan(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) < 0)
    case GreaterThanOrEqual(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, mn, _, v) => cmp(k, mn, v) >= 0)
    case GreaterThanOrEqual(l: Literal, a: Attribute) =>
      allTest(a.name, l, schema, fs)((k, _, mx, v) => cmp(k, mx, v) <= 0)

    // a FILE-CONSTANT column whose constant is one of the literals
    case In(a: Attribute, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => evalAll(EqualTo(a, v.asInstanceOf[Literal]),
        schema, fs))

    case IsNull(a: Attribute) =>
      statsFor(a.name, schema, fs).exists(_.nulls == fs.rows)
    case IsNotNull(a: Attribute) =>
      statsFor(a.name, schema, fs).exists(_.nulls == 0L)

    // min and max share the prefix ⇒ everything between them does
    case StartsWith(a: Attribute, l: Literal) =>
      allTest(a.name, l, schema, fs)((k, mn, mx, p) =>
        k == KString && mn.startsWith(p) && mx.startsWith(p))

    // NOT: no row may satisfy the inner predicate AND no referenced
    // column may hold nulls (NOT(NULL) is NULL — not satisfied)
    case Not(inner) =>
      val refs = inner.collect { case a: Attribute => a.name }.distinct
      refs.nonEmpty &&
        refs.forall(n => statsFor(n, schema, fs).exists(_.nulls == 0L)) &&
        !eval(inner, schema, fs)

    case Literal(b: Boolean, BooleanType) => b

    case _ => false
  }

  /** [[evalAll]]'s value-test template: provable only with stats
    * present, BOTH bounds defined, and zero nulls.
    */
  private def allTest(attr: String, lit: Literal, schema: StructType,
      fs: FileStats)(test: (Kind, String, String, String) => Boolean)
      : Boolean =
    resolve(attr, lit, schema, fs) match {
      case None => false
      case Some((r, k, v)) =>
        r.nulls == 0L && ((r.min, r.max) match {
          case (Some(mn), Some(mx)) => test(k, mn, mx, v)
          case _ => false
        })
    }
}

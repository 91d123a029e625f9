package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A PERSISTENT catalog for txlog tables — names survive the session
  * because the catalog IS a directory tree (the Iceberg-HadoopCatalog
  * pattern, which is how a 1000-executor deployment names lakehouse
  * tables without a metastore service): `root/<namespace…>/<table>`
  * holds the table's transaction log, and any session configured with
  *
  * {{{
  * spark.sql.catalog.lake      = graft.sources.TxLogCatalog
  * spark.sql.catalog.lake.root = /shared/warehouse
  * }}}
  *
  * resolves `lake.db.t` to the SAME table — `CREATE TABLE` /
  * `CREATE TABLE AS SELECT` / `INSERT INTO` / `INSERT OVERWRITE` /
  * `SELECT` / `DROP` / `SHOW TABLES` run through Spark's own V2
  * catalog exec nodes; MERGE/UPDATE/DELETE/time travel route through
  * [[graft.plans.GraftSqlParser]], which resolves catalog-qualified
  * names to the table directory. No Derby/Hive service dependency; an
  * atomic-rename filesystem (posix/HDFS) gives create/drop the same
  * guarantees commits already rely on. Unlike the in-memory session
  * catalog (`CREATE TABLE ... USING txlog OPTIONS(path ...)`), names
  * registered here are durable across JVMs.
  *
  * Identifier hygiene: every name part must be a plain identifier
  * (letters/digits/_/-) — the part IS a directory name, so path
  * separators or dot-dots must never smuggle a table outside `root`.
  */
class TxLogCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _
  private var store: TxStore = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = Option(options.get("root")).getOrElse(throw
      new IllegalArgumentException(
        s"TxLogCatalog '$name' needs spark.sql.catalog.$name.root=<dir>"))
    // the catalog tree lives on whatever filesystem the root's scheme
    // names (file:/hdfs://object store), resolved through the session
    // Hadoop conf exactly like the tables it holds
    val (st, rp) = TxStore.forSpec(r,
      SparkSession.active.sessionState.newHadoopConf())
    store = st
    root = rp
    store.mkdirs(root)
  }

  override def name(): String = catalogName

  private def checkPart(p: String): String = {
    require(p.nonEmpty && p.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"catalog name part '$p' must be a plain identifier")
    p
  }

  private def dirOf(ident: Identifier): Path =
    new Path(ident.namespace().foldLeft(root)((d, p) =>
      new Path(d, checkPart(p))), checkPart(ident.name()))

  /** Directory of a catalog-relative name — the
    * [[graft.plans.GraftSqlParser]] seam that routes MERGE / UPDATE /
    * DELETE / time travel on `catalog.ns.table` identifiers to the
    * table primitives. Returns None (never throws) when the name
    * doesn't hold a txlog table.
    */
  private[graft] def tableDir(parts: Seq[String]): Option[String] =
    try {
      val d = parts.foldLeft(root)((acc, p) => new Path(acc, checkPart(p)))
      if (isTableDir(d)) Some(d.toString) else None
    } catch { case _: IllegalArgumentException => None }

  private def dirOf(ns: Array[String]): Path =
    ns.foldLeft(root)((d, p) => new Path(d, checkPart(p)))

  private def isTableDir(d: Path): Boolean =
    store.isDir(new Path(d, "_log"))

  private def spark: SparkSession = SparkSession.active

  // ── tables ─────────────────────────────────────────────────────────

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace)
    if (!store.isDir(d)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    store.list(d).iterator.map(new Path(d, _))
      .filter(p => store.isDir(p) && isTableDir(p))
      .map(p => Identifier.of(namespace, p.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    val t = new TxLogTable(spark, d.toString)
    new TxLogV2Table(spark, d.toString, t.currentVersion, None,
      nativeWrite = true)
  }

  /** `PARTITIONED BY (c, …)` on a txlog table is accepted as
    * CLUSTER-BY metadata (identity transforms on top-level columns
    * only): the table stays one directory tree — no hive-style
    * per-value directories, none of their small-file/metastore
    * explosion — but every NATIVE write clusters and splits its
    * staged files so each file is CONSTANT in the partition columns,
    * with per-file stats recorded. That is exactly the layout the
    * grouped manifest census and file skipping consume, so
    * `GROUP BY c` answers from the manifest and point predicates
    * prune — the two things users actually partition for. Dynamic
    * partition OVERWRITE is rejected loudly (per-partition
    * replacement is not expressible dir-granularly; use
    * truncate-overwrite or MERGE).
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val clusterCols = partitions.toSeq.map { t =>
      if (t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1) {
        val c = t.references()(0).fieldNames()(0)
        require(schema.fieldNames.contains(c),
          s"PARTITIONED BY column '$c' is not in the table schema")
        c
      } else throw new UnsupportedOperationException(
        s"txlog tables support PARTITIONED BY (identity columns) only " +
          s"(got $t); bucket/date transforms are not supported — " +
          "use sortCols/OPTIMIZE ZORDER for derived layouts")
    }
    val provider = properties.get(TableCatalog.PROP_PROVIDER)
    require(provider == null || provider.equalsIgnoreCase("txlog"),
      s"catalog '$catalogName' stores txlog tables only, got USING $provider")
    val d = dirOf(ident)
    if (isTableDir(d)) throw new TableAlreadyExistsException(ident)
    store.mkdirs(d.getParent)
    val t = new TxLogTable(spark, d.toString)
    t.ensureExists(schema,
      markers = if (clusterCols.isEmpty) Map.empty
        else Map("clusterBy" -> clusterCols.mkString(",")))
    new TxLogV2Table(spark, d.toString, t.currentVersion, None,
      nativeWrite = true)
  }

  /** ALTER TABLE column changes route to the engine's METADATA-ONLY
    * evolution commits: RENAME COLUMN → [[TxLogTable.renameColumn]]
    * (files keep their stable physical names), ALTER COLUMN TYPE →
    * [[TxLogTable.widenColumn]] (lossless widenings only — the table
    * rejects narrowing), ADD COLUMN → [[TxLogTable.addColumn]]
    * (nullable, existing rows read null, no file touched), DROP
    * COLUMN → [[TxLogTable.dropColumn]] (schema-only commit, physical
    * name tombstoned). Anything else (nested fields, comments)
    * throws.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val d = dirOf(ident)
    if (!isTableDir(d)) throw new NoSuchTableException(ident)
    val t = new TxLogTable(spark, d.toString)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "RENAME COLUMN supports top-level columns only")
        t.renameColumn(r.fieldNames()(0), r.newName())
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "ALTER COLUMN TYPE supports top-level columns only")
        t.widenColumn(u.fieldNames()(0), u.newDataType())
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ADD COLUMN supports top-level columns only")
        require(a.isNullable,
          "ADD COLUMN must be nullable (existing rows read null)")
        // loud-failure policy: clauses the metadata-only commit cannot
        // honor must REJECT, not silently produce a different schema
        // than requested (FIRST/AFTER would reorder, COMMENT/DEFAULT
        // would be dropped)
        if (a.position() != null) throw new UnsupportedOperationException(
          "ADD COLUMN FIRST/AFTER is not supported on txlog tables " +
            "(columns append at the end of the schema)")
        if (a.comment() != null) throw new UnsupportedOperationException(
          "ADD COLUMN ... COMMENT is not supported on txlog tables")
        if (a.defaultValue() != null) throw new UnsupportedOperationException(
          "ADD COLUMN ... DEFAULT is not supported on txlog tables " +
            "(existing rows read null)")
        t.addColumn(a.fieldNames()(0), a.dataType())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "DROP COLUMN supports top-level columns only")
        val name = del.fieldNames()(0)
        val missing = !t.schemaAt(t.currentVersion)
          .fieldNames.contains(name)
        if (missing && java.lang.Boolean.TRUE.equals(del.ifExists())) ()
        else t.dropColumn(name)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported on txlog tables")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    if (!isTableDir(d)) return false
    // delete children before parents; the _log dir goes LAST so a
    // crashed drop leaves a still-recognizable (re-droppable) table
    // rather than an orphaned data tree that re-CREATE would trip on
    val (log, rest) = store.list(d).partition(_ == "_log")
    (rest ++ log).foreach(c => store.deleteRecursive(new Path(d, c)))
    store.deleteIfExists(d)
    // a re-CREATE at this root starts a new table lifetime; cached
    // manifests of the dropped one must not serve it
    TxLogTable.invalidateCachedRoot(d.toString)
    true
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    val to = dirOf(newIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent)
    store.mkdirs(to.getParent)
    require(store.fs.rename(from, to),
      s"rename $from -> $to failed on ${store.fs.getScheme}")
    // both roots change lifetime: the old root may be re-created, and
    // the new root must not inherit entries from a prior occupant
    TxLogTable.invalidateCachedRoot(from.toString)
    TxLogTable.invalidateCachedRoot(to.toString)
  }

  // ── namespaces (plain directories) ─────────────────────────────────

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val d = dirOf(namespace)
    if (!store.isDir(d)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    store.list(d).iterator.map(new Path(d, _))
      .filter(p => store.isDir(p) && !isTableDir(p))
      .map(p => namespace :+ p.getName)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = dirOf(namespace)
    namespace.isEmpty || (store.isDir(d) && !isTableDir(d))
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    java.util.Collections.singletonMap(
      SupportsNamespaces.PROP_LOCATION, dirOf(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val d = dirOf(namespace)
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(
        (catalogName +: namespace.toSeq).toArray)
    store.mkdirs(d)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "txlog catalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = dirOf(namespace)
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val empty = store.list(d).isEmpty
    if (!empty && !cascade) throw new NonEmptyNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    store.deleteRecursive(d)
    true
  }
}

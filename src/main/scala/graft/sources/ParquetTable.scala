package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Path-based parquet "table" with the reference's sink semantics
  * (SURVEY §2.1 S7-S10): existence-checked create, append, and an
  * atomic overwrite for merge results.
  *
  * Offline there is no transactional table format, so merge = write the
  * post-merge state to a staging dir, then swap directories with two
  * renames (SURVEY §7 "hard parts" #1). The swap window is the
  * non-transactional residue — on a real deployment this class is the
  * seam where Delta/Iceberg MERGE plugs in; every caller goes through
  * [[overwriteAtomic]] so nothing else changes.
  *
  * Layout policy at scale: callers pass `sortCols` so the written files
  * carry min/max-prunable layout on the reference's indexed columns
  * (the postcode secondary index of `initial_price_paid_data.py:86`
  * becomes sortWithinPartitions + parquet row-group stats).
  */
final class ParquetTable(spark: SparkSession, root: String) {

  private def dir: Path = Paths.get(root)

  def exists: Boolean = Files.exists(dir.resolve("_SUCCESS")) ||
    (Files.isDirectory(dir) && {
      // NIO directory streams hold an fd until closed — streaming
      // ingests call this per micro-batch, so leaks accumulate
      val s = Files.list(dir)
      try s.findFirst().isPresent finally s.close()
    })

  /** S7: existence-checked create (CREATE TABLE IF NOT EXISTS). */
  def ensureExists(schema: StructType): Unit = if (!exists) {
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode(SaveMode.Overwrite).parquet(root)
  }

  def read(): DataFrame = spark.read.parquet(root)

  /** S8: plain append (micro-batch inserts). */
  def append(df: DataFrame, sortCols: Seq[String] = Nil): Unit =
    sorted(df, sortCols).write.mode(SaveMode.Append).parquet(root)

  /** Atomic-ish overwrite: stage → double rename. Readers between the
    * two renames would miss the table; acceptable in batch-job context
    * (single writer, no concurrent readers during a DAG run).
    *
    * `markers` (filename → content) are written INTO the staging dir
    * before the swap, so they become visible exactly when the data
    * does — the commit-metadata hook exactly-once consumers need (a
    * batch id that travels atomically with the state it produced, see
    * [[marker]]).
    */
  def overwriteAtomic(df: DataFrame, sortCols: Seq[String] = Nil,
      markers: Map[String, String] = Map.empty): Unit = {
    val staging = Paths.get(root + ".staging")
    val old = Paths.get(root + ".old")
    deleteRecursive(staging)
    sorted(df, sortCols).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    markers.foreach { case (name, content) =>
      Files.writeString(staging.resolve(name), content)
    }
    deleteRecursive(old)
    if (Files.exists(dir)) Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
  }

  /** Content of marker file `name` in the committed table, if present. */
  def marker(name: String): Option[String] = {
    val p = dir.resolve(name)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  /** Small-files compaction: rewrite the table into
    * ⌈rows / targetRowsPerFile⌉ files via `coalesce` (a repartition-
    * free narrow merge) behind the same staged atomic swap. The
    * maintenance pass after many micro-batch appends — at 100 TB the
    * small-files tax (per-file open/footer cost, driver listing,
    * scheduler overhead) dominates reads of an un-compacted table long
    * before data volume does.
    */
  def compact(targetRowsPerFile: Long, sortCols: Seq[String] = Nil): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val df = read()
    val n = df.count()
    val files =
      math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    overwriteAtomic(df.coalesce(files), sortCols)
  }

  private def sorted(df: DataFrame, sortCols: Seq[String]): DataFrame =
    if (sortCols.isEmpty) df
    else df.sortWithinPartitions(sortCols.map(df.col): _*)

  private def deleteRecursive(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally s.close()
  }
}

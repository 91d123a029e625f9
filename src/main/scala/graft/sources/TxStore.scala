package graft.sources

import java.io.FileNotFoundException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The txlog store IO layer: every byte of table METADATA the engine
  * reads or writes — manifests, stats checkpoints, deletion-vector
  * dirs, the `_last_checkpoint` pointer, the catalog directory tree —
  * goes through `org.apache.hadoop.fs.FileSystem`, the storage API
  * Spark itself ships and configures (DATA files always did: they are
  * written and read by Spark's parquet source). That makes a table
  * root scheme-portable: `file:` in the sandbox, `hdfs://` on a
  * cluster, `s3a://gs://abfss://` on object stores — with commit
  * ATOMICITY supplied by the [[CommitOwner]] matched to what the
  * scheme actually guarantees ([[CommitOwner.forStore]]): POSIX hard
  * links on `file:`, atomic fail-if-exists rename on HDFS-like
  * stores, an external CAS ([[ExternalCasCommitOwner]]) where the
  * store has no atomic primitive at all.
  *
  * This class is deliberately thin — resolution of relative paths,
  * filesystem caching, kerberos, retries and scheme quirks all belong
  * to Hadoop, not here. It only centralizes the two conventions the
  * call sites share: missing paths answer `false`/empty (never
  * throw), and writes of small metadata blobs are open-write-close.
  * A spec pins that no java-nio filesystem call escapes back into
  * the store layer.
  */
private[graft] final class TxStore(val fs: FileSystem) {

  def exists(p: Path): Boolean = fs.exists(p)

  def isDir(p: Path): Boolean =
    try fs.getFileStatus(p).isDirectory
    catch { case _: FileNotFoundException => false }

  def mkdirs(p: Path): Unit = fs.mkdirs(p)

  /** Child NAMES of a directory (empty when missing). */
  def list(p: Path): List[String] =
    try fs.listStatus(p).iterator.map(_.getPath.getName).toList
    catch { case _: FileNotFoundException => Nil }

  def readAllBytes(p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"metadata blob too large: $p ($len bytes)")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  /** Plain (non-atomic) small-blob write; parents auto-created. */
  def write(p: Path, bytes: Array[Byte], overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(bytes) finally out.close()
  }

  def modTime(p: Path): Long = fs.getFileStatus(p).getModificationTime

  def deleteRecursive(p: Path): Unit = { fs.delete(p, true); () }

  def deleteIfExists(p: Path): Unit = { fs.delete(p, false); () }

  /** File length, or the summed length of a directory's parquet
    * part-files — the on-disk accounting [[TxLogRelation.sizeInBytes]]
    * reports so small txlog dimensions still auto-broadcast.
    */
  def parquetBytes(p: Path): Long =
    try {
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) st.getLen
      else fs.listStatus(p).iterator
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    } catch { case _: FileNotFoundException => 0L }
}

private[graft] object TxStore {

  /** The store + resolved root of a table/catalog location. Scheme-less
    * specs normalize to an absolute local-convention path first (the
    * historical behavior: a bare `/tmp/x` stays `/tmp/x`, relative
    * specs anchor at the process cwd) and then resolve against the
    * configured Hadoop default filesystem, exactly as Spark's own file
    * sources do; qualified specs (`file:/…`, `hdfs://…`, `s3a://…`)
    * pass through verbatim.
    */
  def forSpec(spec: String, conf: Configuration): (TxStore, Path) = {
    val p = new Path(spec)
    (new TxStore(p.getFileSystem(conf)), p)
  }

  /** Hadoop `Path` child resolution under the name the java-nio call
    * sites already used — keeps the store layer's path arithmetic
    * reading the same after the migration.
    */
  implicit final class RichPath(private val p: Path) extends AnyVal {
    def resolve(child: String): Path = new Path(p, child)
  }
}

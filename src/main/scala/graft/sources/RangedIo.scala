package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Ranged reads against the cluster filesystem — the primitive that
  * lets archive sources split INSIDE a file instead of materializing
  * it as one task-local `Array[Byte]` (hard 2 GiB JVM cap, and the
  * scale ceiling a single ~20 GB Wikipedia multistream dump would hit
  * immediately). Tasks receive (path, offset, length) extents and
  * read exactly that window through `FileSystem.open + seek`, the
  * same positioned-read path Spark's own columnar scans use — so the
  * shape works identically on file://, HDFS, and S3A.
  *
  * The Hadoop `Configuration` rides a broadcast (Spark's own
  * [[SerializableConfiguration]]) so every executor resolves the same
  * filesystem the driver listed from.
  */
object RangedIo {

  /** Java-serializable Hadoop `Configuration` carrier (the class is
    * not `Serializable` itself; its own `write`/`readFields` wire
    * format carries the properties) — what lets executor tasks open
    * the same filesystem the driver listed from.
    */
  final class SerConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(new java.io.DataOutputStream(out))
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(new java.io.DataInputStream(in))
    }
  }

  /** Broadcast the session's Hadoop conf for executor-side opens. */
  def confBroadcast(spark: SparkSession): Broadcast[SerConf] =
    spark.sparkContext.broadcast(
      new SerConf(spark.sparkContext.hadoopConfiguration))

  /** Expand a path glob to (path, fileLength) — names and sizes only,
    * never bytes; the driver-side cost is one listing RPC per
    * directory, same as any Spark scan's file listing.
    */
  def listFiles(spark: SparkSession, glob: String): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(glob)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses.iterator
      .filter(_.isFile)
      .map(s => (s.getPath.toString, s.getLen))
      .toSeq
      .sortBy(_._1)
  }

  /** Read exactly [offset, offset+length) of `path`. Extents above
    * 2 GiB cannot be a JVM array — callers keep extents bounded (a
    * bz2 stream, a gzip member run, a scan chunk); a violation is a
    * loud error, never a silent truncation.
    */
  def readRange(conf: Configuration, path: String, offset: Long,
      length: Long): Array[Byte] = {
    require(length >= 0 && length <= Int.MaxValue.toLong,
      s"ranged read of $length bytes at $path:$offset exceeds the 2 GiB " +
        "task-array bound; split the extent")
    val p = new Path(path)
    val fs: FileSystem = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf, 0, buf.length)
      buf
    } finally in.close()
  }

  /** Open `path` as a plain stream positioned at 0 — the sequential
    * whole-file walk for formats that decode incrementally (gzip
    * member chains); bounded memory regardless of file size.
    */
  def openStream(conf: Configuration, path: String): java.io.InputStream = {
    val p = new Path(path)
    p.getFileSystem(conf).open(p)
  }
}

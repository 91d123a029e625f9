package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the per-tier query registries. Lives outside
  * [[ExtQueries]] so tier objects don't reference back into the
  * composing object during their own initialization (an object-init
  * cycle would read half-constructed vals).
  */
object QueryUtil {

  type Q = (SparkSession, String) => DataFrame

  /** Driver-local scratch dir for queries that exercise a write→read
    * path (txlog, parquet/orc/avro footers). Registered for recursive
    * delete at JVM exit so repeated bench/correctness runs don't leak
    * files on the driver's disk.
    */
  private val scratchPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // ONE shutdown hook draining the queue — per-call hooks would pin a
  // Thread per query execution for the JVM's lifetime
  private lazy val scratchHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      var p = scratchPaths.poll()
      while (p != null) { rm(p.toFile); p = scratchPaths.poll() }
    }))

  private[graft] def scratchDir(prefix: String): String = {
    scratchHookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchPaths.add(p)
    p.toString
  }

  /** Token regex shared by the text-tier oracle SQL (interpolated into
    * DuckDB `regexp_extract_all` calls).
    */
  private[queries] val tokRe = "\\S+"
}

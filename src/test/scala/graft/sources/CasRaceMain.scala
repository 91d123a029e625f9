package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

/** Subprocess body for the multi-PROCESS CAS race
  * ([[CasEndToEndSpec]]): a separate JVM committing `n` versions into
  * a shared log directory through [[ExternalCasCommitOwner]] over
  * [[FileCasRegistry]] + [[LocalObjectStoreOps]] — the exact
  * commit-primitive loop [[TxLogTable]] runs, minus Spark (the race
  * is in the owner, not the query engine). Exits 0 after winning `n`
  * versions; every loss advances to the next version like the
  * table's optimistic commitLoop does.
  */
object CasRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, casDir, writerId, nStr) = args
    val n = nStr.toInt
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val owner = new ExternalCasCommitOwner(
      new FileCasRegistry(Paths.get(casDir)), LocalObjectStoreOps,
      writerId)
    var wins = 0
    var v = 0L
    while (wins < n && v < 10000) {
      val dest = new org.apache.hadoop.fs.Path(root, f"$v%020d.json")
      val payload =
        s"""{"writer":"$writerId","v":$v,"pad":"${"x" * 256}","end":true}"""
      if (owner.putIfAbsent(fs, dest,
          payload.getBytes(StandardCharsets.UTF_8))) wins += 1
      v += 1
    }
    if (wins < n) { System.err.println(s"$writerId starved"); sys.exit(2) }
  }
}

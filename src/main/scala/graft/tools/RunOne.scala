package graft.tools

import graft.core.Sessions

/** Dev tool: execute named SparkEntry queries end-to-end and print
  * row count + wall time. Usage: runMain graft.tools.RunOne <sfDir> <q...>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local()
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).collect()
      println(f"[runone] $n rows=${rows.length} " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.ext.HashedClassifier

/** Measures q101's held-out AUC and wall time per SF — the numbers
  * cited in the q101 comment and BASELINE.md.
  */
object ProfileQ101 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val toks = split(lower(col("text")), "\\s+")
      val labeled = Tables.documents(s, dir).select(
        col("doc_id"), col("text"),
        (size(filter(toks, t => t === "data")) / size(toks) >= 0.03)
          .cast("double").as("y"))
      val train = labeled.filter(pmod(col("doc_id"), lit(5)) < 4)
      val heldOut = labeled.filter(pmod(col("doc_id"), lit(5)) === 4)
      val model = HashedClassifier.fit(train, "text", "y",
        dim = 1 << 15, iters = 15)
      val scored = HashedClassifier.predict(heldOut, "text", model)
      val auc = HashedClassifier.auc(scored, "y", "prob", Seq("doc_id"))
      println(f"$dir auc=$auc%.4f wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    s.stop()
  }
}

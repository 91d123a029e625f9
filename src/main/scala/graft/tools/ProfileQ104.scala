package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.ext.Bpe

/** Stage timing for the q104 BPE gate. */
object ProfileQ104 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(s, dir).select(col("text"))
    val merges = Bpe.train(docs, "text", nMerges = 12)
    val words = Bpe.wordFreq(docs, "text").cache()
    words.count()
    for (n <- Seq(1, 2, 4, 8, 12, 12)) {
      val t0 = System.nanoTime()
      val tok = Bpe.tokenizeWords(words, merges.take(n))
        .filter(concat_ws("", col("syms")) =!= col("word"))
      val tPlan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val p = tok.queryExecution.executedPlan
      val tExec0 = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val bad = tok.count()
      val tExec = (System.nanoTime() - t2) / 1e9
      println(f"[prof] n=$n plan=$tPlan%.2f physical=$tExec0%.2f exec=$tExec%.2f bad=$bad")
    }
    s.stop()
  }
}

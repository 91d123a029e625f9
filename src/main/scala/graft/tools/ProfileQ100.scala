package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.ext.{ProductQuantization, SimilaritySearch}

/** Measures q100 (raw IVFADC) recall/wall at different Lloyd-round
  * budgets — the data behind the gate's iters choice.
  */
object ProfileQ100 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val n = exact.count()
      for (it <- Seq(5, 3)) {
        val t1 = System.nanoTime()
        val model = ProductQuantization.train(emb, dim = 64, iters = it)
        val approx = ProductQuantization.ivfAdcTopK(emb, q, topK = 5, model)
          .select(col("query_id"), col("cand_id"))
        val hit = exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
          .count()
        println(f"$dir iters=$it recall=${hit.toDouble / n}%.3f " +
          f"wall=${(System.nanoTime() - t1) / 1e9}%.2fs")
      }
      exact.unpersist()
    }
    s.stop()
  }
}

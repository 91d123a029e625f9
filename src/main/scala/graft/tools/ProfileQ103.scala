package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.ext.{ProductQuantization, SimilaritySearch}

/** Measures residual-IVFADC recall and wall time per SF — the numbers
  * cited in the q103 comment.
  */
object ProfileQ103 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val n = exact.count()
      for ((ci, pi, tf) <- Seq((2, 3, 1.0), (1, 3, 1.0))) {
        val t1 = System.nanoTime()
        val approx = ProductQuantization.ivfAdcResidualTopK(emb, q,
            topK = 5, coarseIters = ci, pqIters = pi, trainFraction = tf)
          .select(col("query_id"), col("cand_id"))
        val hit = exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
          .count()
        println(f"$dir ci=$ci pi=$pi tf=$tf recall=${hit.toDouble / n}%.3f " +
          f"wall=${(System.nanoTime() - t1) / 1e9}%.2fs")
      }
      exact.unpersist()
    }
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Round-17 phase profiler: per-phase wall times of the hot bench
  * queries at sf0.1 (warm JVM — each block runs twice, second timing
  * reported). Source of the "measured" numbers in OPTIMIZATION_r17.md.
  */
object ProfR17 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.toSet

    def t[A](name: String)(f: => A): A = {
      val r0 = f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      identity(r0); r
    }

    if (which.isEmpty || which("q24")) {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      t("q24.full")(graft.ext.NGramJaccard.allPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.5).count())
    }
    if (which.isEmpty || which("q79")) {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val pairs = graft.ext.NGramJaccard.allPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.5)
      t("q79.pairs+cc")(graft.ext.ConnectedComponents
        .auto(pairs, "doc_a", "doc_b").count())
      t("q79.full")(graft.SparkEntry.queries("q79_canonical_by_quality")(s, dir).count())
    }
    if (which.isEmpty || which("q168")) {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      t("q168.edges-only")(edges.count())
      t("q168.full")(graft.ext.Hits.run(edges, "src", "dst", iters = 2).count())
    }
    if (which.isEmpty || which("q71")) {
      t("q71.full")(graft.SparkEntry.queries("q71_pagerank")(s, dir).count())
      t("q169.full")(graft.SparkEntry.queries("q169_label_propagation")(s, dir).count())
    }
    if (which.isEmpty || which("q101")) {
      val toks = split(lower(col("text")), "\\s+")
      val labeled = Tables.documents(s, dir).select(
        col("doc_id"), col("text"),
        (size(filter(toks, tk => tk === "data")) / size(toks) >= 0.03)
          .cast("double").as("y"))
      val train = labeled.filter(pmod(col("doc_id"), lit(5)) < 4)
      t("q101.fit15")(graft.ext.HashedClassifier.fit(
        train, "text", "y", dim = 1 << 15, iters = 15))
      t("q101.full")(graft.SparkEntry.queries("q101_quality_classifier_floor")(s, dir).count())
    }
    if (which("q119")) {
      import graft.sources.TxLogTable
      val ord = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val target = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      val src = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").as("new_price"),
          (max(when(col("l_returnflag") === "R", 1).otherwise(0)) === 1)
            .as("has_return"))
        .join(ord.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus")), Seq("o_orderkey"))
        .withColumn("o_totalprice", col("new_price"))
      var i = 0
      def once(): Unit = {
        i += 1
        val t = new TxLogTable(s,
          graft.queries.QueryUtil.scratchDir(s"graft_prof_q119_$i"))
        val t0 = System.nanoTime()
        t.ensureExists(target.schema)
        t.append(target)
        val t1 = System.nanoTime()
        t.mergeConditional(src, Seq("o_orderkey"),
          whenMatched = Seq(
            TxLogTable.MatchedDelete(Some("s.has_return")),
            TxLogTable.MatchedUpdate(Some("s.new_price > t.o_totalprice"))),
          notMatchedCondition = Some("NOT s.has_return"))
        val t2 = System.nanoTime()
        t.read().count()
        val t3 = System.nanoTime()
        println(f"[prof] q119.phases append=${(t1 - t0) / 1e9}%.2f " +
          f"merge=${(t2 - t1) / 1e9}%.2f read=${(t3 - t2) / 1e9}%.2f")
      }
      once(); once()
    }
    if (which.isEmpty || which("q74")) {
      val li = Tables.lineitem(s, dir).select(col("l_extendedprice"))
      t("q74.cutpoints")(graft.ext.Binning.cutpoints(li, "l_extendedprice", 10))
      t("q74.full")(graft.SparkEntry.queries("q74_equidepth_bins")(s, dir).count())
    }
    if (which.isEmpty || which("q103")) {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      t("q103.brute")(graft.ext.SimilaritySearch.bruteForceTopK(emb, q, k = 5).count())
      t("q103.approx")(graft.ext.ProductQuantization.ivfAdcResidualTopK(
        emb, q, topK = 5, pqIters = 3).count())
      t("q103.full")(graft.SparkEntry.queries("q103_ann_residual_recall_floor")(s, dir).count())
    }
    if (which.isEmpty || which("q45")) {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      t("q45.lsh")(graft.ext.SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64).count())
      t("q45.ivf")(graft.ext.SimilaritySearch.ivfTopK(emb, q, k = 5, dim = 64).count())
      t("q45.full")(graft.SparkEntry.queries("q45_ann_upper_bound")(s, dir).count())
    }
    s.stop()
  }
}

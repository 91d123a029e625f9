package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ClosureSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain collapses to one component") {
    // a~b, b~c, plus isolated pair d~e
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val comp = ConnectedComponents.run(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("dropByComponents keeps only canonical docs across chains") {
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val kept = ConnectedComponents.dropByComponents(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("keepBestByComponents equals union-find + argmax on random graphs") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val ids = (1L to n).toSeq
      val scores = ids.map(i => i -> rng.nextInt(5).toDouble / 4).toMap
      val edges = Seq.fill(n / 2)(
        (ids(rng.nextInt(n.toInt)), ids(rng.nextInt(n.toInt))))
        .filter(e => e._1 != e._2)
      // reference: union-find components, then argmax score (tie: min id)
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = ids.groupBy(find).values.map { members =>
        members.minBy(i => (-scores(i), i))
      }.toSet
      val got = ConnectedComponents.keepBestByComponents(
          ids.map(i => i -> scores(i)).toDF("doc_id", "quality"),
          "doc_id", col("quality"),
          edges.toDF("doc_a", "doc_b"))
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("keepBestByComponents keeps the highest-score member; ties break to lowest id") {
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5),   // chain 1-2-3 → keep 2
      (10L, 0.4), (11L, 0.4),            // tie → keep 10
      (99L, 0.0)                         // untouched singleton survives
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val kept = ConnectedComponents
      .keepBestByComponents(docs, "doc_id", col("quality"), pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 99L))
    // exactly one survivor per component, schema untouched
    val out = ConnectedComponents
      .keepBestByComponents(docs, "doc_id", col("quality"), pairs)
    assert(out.columns.toSeq == Seq("doc_id", "quality"))
  }

  test("centroid aggregator matches hand computation and explode-based mean") {
    val df = Seq(
      (0, Array(1f, 3f)), (0, Array(3f, 5f)), (1, Array(10f, 20f))
    ).toDF("label", "embedding")
    val got = Centroids.perGroup(df, "label", "embedding", 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) == Seq(2.0, 4.0))
    assert(got(1) == Seq(10.0, 20.0))
  }

  test("approx_count_distinct within declared rsd of exact") {
    // raw sketch error on lineitem (q46 pins the same bound driver-side)
    val li = Tables.lineitem(spark, sf001)
    val both = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("e"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    both.foreach { case (k, e, a) =>
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
    // and the q38 invariant form (events table) is all-true
    val q38 = graft.SparkEntry.queries("q38_approx_distinct")(spark, sf001)
      .collect()
    assert(q38.nonEmpty && q38.forall(_.getBoolean(1)),
      s"q38 bound violated: ${q38.mkString(",")}")
  }

  test("centroid aggregator on sf0.001 equals posexplode mean") {
    val emb = Tables.embeddings(spark, sf0001)
    val viaAgg = Centroids.perGroup(emb, "label", "embedding", 64)
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "v")))
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .groupBy("label", "dim").agg(avg(col("e").cast("double")).as("v2"))
    val joined = viaAgg.join(viaExplode, Seq("label", "dim"))
      .withColumn("diff", abs(col("v") - col("v2")))
    assert(joined.agg(max("diff")).collect().head.getDouble(0) < 1e-9)
  }
}

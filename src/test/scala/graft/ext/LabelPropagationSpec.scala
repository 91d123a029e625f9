package graft.ext

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  private def sym(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("two triangles joined by a bridge collapse to per-triangle min labels") {
    import spark.implicits._
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3–10
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))).toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round-by-round the min label floods each triangle; the bridge
    // endpoints see a tie-heavy neighborhood but smallest-label wins
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    // triangle 2: min neighbor labels propagate (10 ties broken low)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
  }

  test("hand-computed one round: mode wins, ties to smallest, isolated keeps own") {
    import spark.implicits._
    // node 5's neighbors: {1, 1, 2} → mode 1; node 6's: {3, 4} → tie → 3
    // node 9 has only out-of-graph...: absent — node 7 isolated via self-less
    val edges = Seq((5L, 1L), (5L, 1L), (5L, 2L), (6L, 3L), (6L, 4L))
      .toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1L)
    assert(got(6L) == 3L)
    // pure-sink nodes (no out-edges) keep their own id
    assert(got(1L) == 1L && got(4L) == 4L)
  }

  test("result is invariant to input partitioning") {
    import spark.implicits._
    val base = sym((0L until 300L).map(i => (i % 29, 29 + (i * 11) % 17)))
    val a = LabelPropagation.run(base.toDF("src", "dst").repartition(1),
      "src", "dst", 2).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = LabelPropagation.run(base.reverse.toDF("src", "dst").repartition(13),
      "src", "dst", 2).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("max(struct(c, ~label)) argmax equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random-ish multigraph with parallel edges (weights) and ties
    val edges = sym((0L until 500L).map(i =>
      ((i * 7) % 23, 23 + (i * 13) % 19))).toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // reference: the replaced window formulation, replayed literally
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var labels = nodes.withColumn("label", col("node"))
    val byCount = Window.partitionBy("node")
      .orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to 2) {
      val picked = e
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byCount))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
      labels = nodes
        .join(picked.withColumnRenamed("label", "new_label"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("node")).as("label"))
        .localCheckpoint()
    }
    val ref = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == ref)
  }

  test("iters = 0 returns identity labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }
}

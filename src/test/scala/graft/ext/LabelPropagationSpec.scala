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

  test("iters = 0 returns identity labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }
}

package graft.ext

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = PageRank.Scale

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("hand-checked two-node cycle reaches the uniform fixed point") {
    // a↔b: each node's contribution is its full rank; by symmetry every
    // round gives base + 85% of S/2 (mirroring the integer ops exactly)
    val expected = (S / 100L) * 15L / 2L + 85L * (S / 2L) / 100L
    val out = run(Seq(1L -> 2L, 2L -> 1L), 3)
    assert(out == Map(1L -> expected, 2L -> expected))
  }

  test("mass is conserved up to truncation leak; deterministic under repartition") {
    val edges = for { a <- 1L to 40L; b <- Seq((a % 40) + 1, (a * 7 % 40) + 1) }
      yield a -> b
    val out = run(edges, 5)
    val total = out.values.sum
    assert(total <= S && total >= (S * 999L) / 1000L, s"mass $total")
    val df = edges.toDF("src", "dst").repartition(13)
    val out2 = PageRank.run(df, "src", "dst", 5).as[(Long, Long)].collect().toMap
    assert(out == out2)
  }

  test("dangling nodes absorb but never emit; authority flows to sinks") {
    // 1→2, 3→2: node 2 is dangling. Its rank grows; 1 and 3 fall to base.
    val out = run(Seq(1L -> 2L, 3L -> 2L), 2)
    val n = 3L
    val base = (S / 100L) * 15L / n
    assert(out(1L) == base && out(3L) == base)
    assert(out(2L) > out(1L))
    // round 2: node 2 receives 85% of two base-rank contributions
    assert(out(2L) == base + 85L * (base + base) / 100L)
  }

  test("parallel edges weight contributions by multiplicity") {
    // 1→2 twice, 1→3 once: outdeg(1)=3, node 2 gets 2 shares, node 3 one
    // (plus back-edges so nothing dangles)
    val out = run(Seq(1L -> 2L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 1L), 1)
    val r0 = S / 3L
    val n = 3L
    val base = (S / 100L) * 15L / n
    assert(out(2L) == base + 85L * (2L * (r0 / 3L)) / 100L)
    assert(out(3L) == base + 85L * (r0 / 3L) / 100L)
  }

  test("zero iterations returns the uniform prior") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L), 0)
    assert(out.values.toSet == Set(S / 3L))
  }

  test("checkpoint cadence never changes a bit") {
    val edges = for { a <- 1L to 25L; b <- Seq((a % 25) + 1, (a * 3 % 25) + 1) }
      yield a -> b
    val df = edges.toDF("src", "dst")
    val every1 = PageRank.run(df, "src", "dst", 7, checkpointEvery = 1)
      .as[(Long, Long)].collect().toMap
    val every3 = PageRank.run(df, "src", "dst", 7, checkpointEvery = 3)
      .as[(Long, Long)].collect().toMap
    val never = PageRank.run(df, "src", "dst", 7, checkpointEvery = 100)
      .as[(Long, Long)].collect().toMap
    assert(every1 == every3 && every3 == never)
  }
}

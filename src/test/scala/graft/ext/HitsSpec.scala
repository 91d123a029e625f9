package graft.ext

import graft.SparkSpec

class HitsSpec extends SparkSpec {

  test("hand-computed two rounds on a 4-node bipartite graph, bit-exact") {
    import spark.implicits._
    // 1→3, 2→3, 2→4: node 2 is the better hub (hits both authorities),
    // node 3 the better authority (pointed at by both hubs).
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Hits.run(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round 1 (by hand): h0 = 25e10 each; a1 = (2/3, 1/3)·1e12 on (3,4)
    //   → h1 = (4e11, 6e11) on (1,2), EXACT (divisions land on integers)
    // round 2: a2r = (1e12, 6e11), t = 1.6e12 → a2 = (625e9, 375e9);
    //   h2r = (625e9, 1e12), t = 1.625e12 → h2 = (⌊0.384615…e12⌋, ⌊0.615384…e12⌋)
    assert(got(1L) == (384615384615L, 0L))
    assert(got(2L) == (615384615384L, 0L))
    assert(got(3L) == (0L, 625000000000L))
    assert(got(4L) == (0L, 375000000000L))
  }

  test("L1 mass is conserved up to truncation drift (< N per side)") {
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i % 17, 17 + i % 13)).toDF("src", "dst")
    val rows = Hits.run(edges, "src", "dst", iters = 3).collect()
    val n = rows.length
    val hubSum = rows.map(_.getLong(1)).sum
    val authSum = rows.map(_.getLong(2)).sum
    assert(hubSum <= Hits.Scale && hubSum > Hits.Scale - n)
    assert(authSum <= Hits.Scale && authSum > Hits.Scale - n)
  }

  test("result is invariant to input partitioning (integer arithmetic)") {
    import spark.implicits._
    val base = (0L until 500L).map(i => (i % 23, 23 + (i * 7) % 19))
    val a = Hits.run(base.toDF("src", "dst").repartition(1), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Hits.run(base.reverse.toDF("src", "dst").repartition(13), "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("parallel edges act as weights") {
    import spark.implicits._
    // duplicated 1→3 doubles 1's pull on 3 relative to 2→4
    val edges = Seq((1L, 3L), (1L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Hits.run(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a1r: 3 ← 2·25e10 = 5e11; 4 ← 25e10; t = 7.5e11
    assert(got(3L)._2 == 666666666666L)
    assert(got(4L)._2 == 333333333333L)
    // h1r: 1 ← 2·a(3) = 1333333333332; 2 ← a(4); t = 1666666666665
    // both divisions land exactly (t·0.8 and t·0.2 are integers)
    assert(got(1L)._1 == 800000000000L)
    assert(got(2L)._1 == 200000000000L)
  }
}

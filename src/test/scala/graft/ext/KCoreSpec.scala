package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Pins the synchronous peel against hand-computed cores: cascade
  * peeling (removals triggering removals), convergence detection, and
  * round monotonicity (extra rounds past the fixed point are no-ops).
  */
class KCoreSpec extends SparkSpec {

  private def edgeDf(pairs: (Long, Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pairs.map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))))
  }

  private def asMap(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    d.collect().map(r => r.getLong(0) -> r.getAs[Long]("deg")).toMap

  // triangle {10,11,12} plus a dangling path 12-13-14-15: for k=2 the
  // path unravels ONE vertex per synchronous round (15's removal is
  // what pushes 14 below 2, and so on) — a genuine cascade, unlike a
  // pendant set that all falls in round 1
  private val triChain = Seq(
    (10L, 11L), (11L, 12L), (10L, 12L),
    (12L, 13L), (13L, 14L), (14L, 15L))

  test("cascade peel: the path unravels one vertex per round into the triangle") {
    val out = KCore.peel(edgeDf(triChain: _*), k = 2, rounds = 3)
    assert(asMap(out) === Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
    assert(KCore.converged(out, 2))
    // one round only strips the endpoint — not yet the core
    val one = KCore.peel(edgeDf(triChain: _*), k = 2, rounds = 1)
    assert(asMap(one).keySet === Set(10L, 11L, 12L, 13L, 14L))
    assert(!KCore.converged(one, 2))
    // two rounds: 14 gone, 13 still hanging
    val two = KCore.peel(edgeDf(triChain: _*), k = 2, rounds = 2)
    assert(asMap(two).keySet === Set(10L, 11L, 12L, 13L))
  }

  test("rounds past the fixed point change nothing") {
    val three = asMap(KCore.peel(edgeDf(triChain: _*), k = 2, rounds = 3))
    val eight = asMap(KCore.peel(edgeDf(triChain: _*), k = 2, rounds = 8))
    assert(three === eight)
  }

  test("a graph with no k-core peels to empty") {
    // a tree has no 2-core
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L))
    val out = KCore.peel(edgeDf(tree: _*), k = 2, rounds = 5)
    assert(out.count() === 0L)
    assert(KCore.converged(out, 2))
  }

  test("k=1 keeps every non-isolated vertex") {
    val out = KCore.peel(edgeDf((1L, 2L), (3L, 4L)), k = 1, rounds = 2)
    assert(asMap(out) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}

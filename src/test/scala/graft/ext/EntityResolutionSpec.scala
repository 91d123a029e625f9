package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "kitten", "b1"), (2L, "sitting", "b1"), (3L, "kitten!", "b1"),
    (4L, "kitten", "b2"), // same text, different block — never paired
    (5L, "completely different", "b1"))

  private def run(maxDist: Int) =
    EntityResolution.blockedEditDistancePairs(
      rows.toDF("id", "name", "blk"), "id", "name", col("blk"), maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("hand-checked distances within blocks; bound excludes far pairs") {
    // kitten↔sitting = 3, kitten↔kitten! = 1, sitting↔kitten! = 3
    assert(run(3) == Set((1L, 2L, 3), (1L, 3L, 1), (2L, 3L, 3)))
    // tighter bound cuts the distance-3 pairs, keeps the typo pair
    assert(run(2) == Set((1L, 3L, 1)))
  }

  test("blocking: cross-block pairs never compared; each pair once, id_a < id_b") {
    val out = run(10)
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    out.foreach(p => assert(p._1 < p._2))
    assert(out.map(p => (p._1, p._2)).size == out.size)
  }

  test("identical strings at distance 0; maxDist 0 finds exact dupes only") {
    val dupes = Seq((1L, "same", "b"), (2L, "same", "b"), (3L, "off", "b"))
    val out = EntityResolution.blockedEditDistancePairs(
      dupes.toDF("id", "name", "blk"), "id", "name", col("blk"), 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }
}

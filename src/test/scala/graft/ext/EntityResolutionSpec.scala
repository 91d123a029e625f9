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

  test("length-filter blocking loses nothing vs brute force on random strings") {
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val rng = new scala.util.Random(7)
    val data = (1L to 120L).map(i =>
      (i, rng.alphanumeric.take(2 + rng.nextInt(14)).mkString, s"b${i % 3}"))
    val expected = (for {
      x <- data; y <- data
      if x._3 == y._3 && x._1 < y._1
      d = lev(x._2, y._2) if d <= 4
    } yield (x._1, y._1, d)).toSet
    val got = EntityResolution.blockedEditDistancePairs(
      data.toDF("id", "name", "blk"), "id", "name", col("blk"), 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("identical strings at distance 0; maxDist 0 finds exact dupes only") {
    val dupes = Seq((1L, "same", "b"), (2L, "same", "b"), (3L, "off", "b"))
    val out = EntityResolution.blockedEditDistancePairs(
      dupes.toDF("id", "name", "blk"), "id", "name", col("blk"), 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }
}

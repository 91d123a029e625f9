package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class TwoPhaseCCSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(977L + i)).get)
    }

  /** Union-find ground truth with min-id roots. */
  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
  }

  test("two-phase and hash-min CC both equal union-find on random graphs") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L)))
    forAll(edgeGen) { raw =>
      val edges = raw.filter(p => p._1 != p._2)
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val expect = truth(edges)
        val twoPhase = ConnectedComponents.runTwoPhase(df, "a", "b")
          .as[(Long, Long)].collect().toMap
        val hashMin = ConnectedComponents.run(df, "a", "b", maxIter = 30)
          .as[(Long, Long)].collect().toMap
        assert(twoPhase == expect, s"two-phase wrong for $edges")
        assert(hashMin == expect, s"hash-min wrong for $edges")
      }
    }
  }

  test("path graph (hash-min's worst case) collapses to one component") {
    val path = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("a", "b")
    val comp = ConnectedComponents.runTwoPhase(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 30)
    assert(comp.values.toSet == Set(1L))
  }
}

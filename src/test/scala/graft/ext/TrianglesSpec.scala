package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Pins the compact-forward census against brute-force enumeration on
  * adversarial shapes: the orientation argument (each triangle counted
  * at exactly its π-minimum vertex) must survive degree ties, hubs,
  * and disconnected components.
  */
class TrianglesSpec extends SparkSpec {

  private def edgeDf(pairs: (Long, Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pairs.map { case (a, b) => Row(math.min(a, b), math.max(a, b)) }.asJava,
      StructType(Seq(StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))))
  }

  private def brute(pairs: Set[(Long, Long)]): (Long, Long) = {
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if adj(nodes(i))(nodes(j))
      k <- (j + 1) until nodes.size
      if adj(nodes(i))(nodes(k)) && adj(nodes(j))(nodes(k))
    } tri += 1
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    (tri, wedges)
  }

  test("census matches brute force on a seeded random graph with a hub") {
    val rnd = new scala.util.Random(7)
    // 40 nodes, ~120 random edges, plus a hub connected to everyone —
    // the shape where unordered node-iterator wedge counts explode
    val base = (0 until 160).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val hub = (0L until 40L).map(v => (v, 99L))
    val pairs = (base ++ hub).toSet
    val (tri, wedges) = brute(pairs)

    val out = Triangles.stats(edgeDf(pairs.toSeq: _*)).collect().head
    assert(out.getAs[Long]("n_edges") === pairs.size.toLong)
    assert(out.getAs[Long]("n_wedges") === wedges)
    assert(out.getAs[Long]("n_triangles") === tri)
    assert(tri > 0, "fixture must actually contain triangles")
  }

  test("degree ties break by id: a clique counts each triangle once") {
    // K5: all degrees equal — orientation falls back to id order
    val pairs = for {
      a <- 0L until 5L; b <- (a + 1) until 5L
    } yield (a, b)
    val out = Triangles.stats(edgeDf(pairs: _*)).collect().head
    assert(out.getAs[Long]("n_nodes") === 5L)
    assert(out.getAs[Long]("n_edges") === 10L)
    assert(out.getAs[Long]("n_triangles") === 10L) // C(5,3)
    assert(out.getAs[Long]("n_wedges") === 30L)    // 5 * C(4,2)
  }

  test("perNode credits all three corners and sums to 3x the census") {
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val (tri, _) = brute(pairs)
    val per = Triangles.perNode(edgeDf(pairs.toSeq: _*)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_triangles")).toMap
    assert(per.values.sum === 3L * tri)
    // spot-check one node against brute enumeration
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val v0 = adj.keys.min
    val expect0 = adj(v0).toSeq.combinations(2).count {
      case Seq(x, y) => adj(x)(y)
    }.toLong
    assert(per.getOrElse(v0, 0L) === expect0)
  }

  test("co-occurrence projection dedups parallel baskets") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10L), Row(1L, 11L), Row(1L, 10L), // dup item in basket
        Row(2L, 10L), Row(2L, 11L),               // same pair again
        Row(3L, 12L)),                            // singleton basket
      StructType(Seq(StructField("g", LongType, nullable = false),
        StructField("i", LongType, nullable = false))))
    val e = Triangles.coOccurrenceEdges(df, "g", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((10L, 11L)))
  }
}

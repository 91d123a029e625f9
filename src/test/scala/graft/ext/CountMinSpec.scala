package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Pins the CMS contract: the one-sided error (never under-count,
  * bounded over-count), exact cell-wise mergeability (merged sketches
  * ≡ the sketch of the concatenated stream), and exactness when the
  * fixture is verified collision-free under the fixed seed.
  */
class CountMinSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("term", StringType, nullable = false)))

  // Zipf-ish skew: term_i appears (51 - i)^2 / 26 times across 2 sources
  private def fixture() = {
    import scala.jdk.CollectionConverters._
    val rows = for {
      i <- 1 to 50
      n = (51 - i) * (51 - i) / 26 + 1
      j <- 1 to n
    } yield Row(if ((i + j) % 2 == 0) "a" else "b", s"term$i")
    spark.createDataFrame(rows.asJava, schema)
  }

  test("estimates never under-count, even at adversarially tiny width") {
    val df = fixture()
    val exact = df.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // width 4 forces heavy collisions — the lower bound must survive
    val sk = CountMin.sketch(df, Nil, "term", depth = 3, width = 4)
    val est = CountMin.estimate(sk, exact, Nil, "term", depth = 3, width = 4)
    val joined = exact.join(est, "term").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"),
        s"under-count for ${r.getString(0)}")
    }
    // every depth row carries the full stream mass
    val mass = sk.groupBy(col("d")).agg(sum(col("cnt")).as("m"))
      .collect().map(_.getAs[Long]("m")).toSet
    assert(mass === Set(df.count()))
  }

  test("per-source sketches merge cell-for-cell into the global sketch") {
    val df = fixture()
    val perSource = CountMin.sketch(df, Seq("src"), "term")
    val merged = CountMin.merge(Seq(perSource), Nil) // collapse src
    val direct = CountMin.sketch(df, Nil, "term")
    assert(merged.join(direct, Seq("d", "bucket"), "full")
      .filter(merged("cnt").isNull || direct("cnt").isNull ||
        merged("cnt") =!= direct("cnt"))
      .count() === 0L, "merged sketch must equal the direct sketch")
    // merging two disjoint halves likewise
    val h1 = CountMin.sketch(df.filter(col("src") === "a"), Nil, "term")
    val h2 = CountMin.sketch(df.filter(col("src") === "b"), Nil, "term")
    val m2 = CountMin.merge(Seq(h1, h2), Nil)
    assert(m2.join(direct, Seq("d", "bucket"), "full")
      .filter(m2("cnt").isNull || direct("cnt").isNull ||
        m2("cnt") =!= direct("cnt"))
      .count() === 0L)
  }

  test("every term with one clean cell estimates exactly (min over rows)") {
    val df = fixture()
    val exact = df.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val w = 4096
    // exactness condition for est = min over depth rows: the term owns
    // at least ONE cell no other term hashes into. Verify the fixture
    // satisfies it for all 50 terms at seed 42 (a fixture fact — if
    // this fails the fixture changed, not the engine), then demand
    // exact estimates for all of them.
    val cells = df.select(col("term")).distinct()
      .select(explode(sequence(lit(0), lit(3))).as("d"), col("term"))
      .withColumn("bucket",
        pmod(xxhash64(col("term"), col("d") + lit(42L)), lit(w.toLong)))
    val cellOwners = cells.groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val termsWithClean = cells.join(cellOwners, Seq("d", "bucket"))
      .filter(col("n") === 1).select(col("term")).distinct().count()
    assert(termsWithClean === 50L,
      "fixture: every term needs a collision-free cell; re-pin")
    val sk = CountMin.sketch(df, Nil, "term", width = w)
    val est = CountMin.estimate(sk, exact, Nil, "term", width = w)
    assert(exact.join(est, "term")
      .filter(col("est") =!= col("cnt")).count() === 0L)
  }

  test("absent probe term estimates zero when its cells are empty") {
    import scala.jdk.CollectionConverters._
    val df = fixture()
    val sk = CountMin.sketch(df, Nil, "term", width = 4096)
    val probe = spark.createDataFrame(
      Seq(Row("x", "never_seen_term_xyz")).asJava, schema)
    val est = CountMin.estimate(sk, probe, Nil, "term", width = 4096)
      .collect().head.getAs[Long]("est")
    // with 50 terms in 4096 buckets, all 4 cells empty w.h.p. — pinned
    // as a fixture fact like the collision check above
    assert(est === 0L)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("exact cutpoints interpolate like percentile; quartiles of 1..100") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val cuts = Binning.cutpoints(df, "v", 4)
    assert(cuts == Seq(25.75, 50.5, 75.25))
  }

  test("equi-depth buckets carry equal mass; boundary values go up") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val counts = Binning.equiDepth(df, "v", "bucket", 4)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    // a value exactly at a cutpoint lands in the upper bucket
    val b = Seq(50.5).toDF("x")
      .select(Binning.bucketFor(col("x"), Seq(25.75, 50.5, 75.25)).as("b"))
      .as[Int].head()
    assert(b == 3)
  }

  test("approx path stays within sketch tolerance of equal mass") {
    val df = (1 to 10000).map(i => (i * 37 % 10007).toDouble).toDF("v")
    val counts = Binning.equiDepth(df, "v", "bucket", 10, exact = false)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet == (1 to 10).toSet)
    counts.values.foreach(c => assert(c > 700 && c < 1300, s"bucket mass $c"))
  }

  test("cutpoints bit-equal catalyst percentile on randomized dup-heavy data " +
      "across numeric input types (ADVICE r17)") {
    // heavy duplicates (mod 17), a constant run, negatives, and three
    // input column types — each compared against the aggregate the
    // sort-based path replaced, for several bin counts
    val rnd = new scala.util.Random(18)
    val doubles = (1 to 400).map(_ => (rnd.nextInt(17) - 5).toDouble) ++
      Seq.fill(50)(3.0) ++ (1 to 100).map(_ => rnd.nextDouble() * 1e6 - 5e5)
    val longs = (1 to 300).map(_ => rnd.nextInt(23).toLong - 11L)
    val decimals = (1 to 250).map(_ =>
      BigDecimal(rnd.nextInt(100000), 2) - BigDecimal("250.00"))
    def check(df: org.apache.spark.sql.DataFrame, colName: String): Unit =
      for (nBins <- Seq(2, 4, 7, 10)) {
        val ps = (1 until nBins).map(i => i.toDouble / nBins)
        val ref = df
          .agg(expr(s"percentile($colName, array(${ps.mkString(",")}))"))
          .head().getSeq[Double](0).toSeq
        val got = Binning.cutpoints(df, colName, nBins)
        assert(got == ref, s"$colName nBins=$nBins: $got != $ref")
      }
    check(doubles.toDF("v"), "v")
    check(longs.toDF("v"), "v")
    check(decimals.toDF("v"), "v")
  }

  test("nBins must be at least 2") {
    intercept[IllegalArgumentException] {
      Binning.cutpoints(Seq(1.0).toDF("v"), "v", 1)
    }
  }

  test("null values bin to null, not the top bucket; empty input rejected clearly") {
    val withNull = (Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None))
      .toDF("v")
    val buckets = Binning.equiDepth(withNull, "v", "bucket", 2)
      .select("v", "bucket").as[(Option[Double], Option[Int])]
      .collect().toMap
    assert(buckets(None).isEmpty)
    assert(buckets(Some(4.0)).contains(2))
    val err = intercept[IllegalArgumentException] {
      Binning.cutpoints(Seq.empty[Double].toDF("v"), "v", 4)
    }
    assert(err.getMessage.contains("no non-null values"))
  }
}

package graft.ext

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], bucket: Long) =
    Resample.fillGaps(rows.toDF("k", "ts_us"), "k", "ts_us", bucket)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

  test("gaps become explicit zero rows; counts land in their buckets") {
    // key 1: events in buckets 0 and 30 (gap at 10, 20); key 2: single bucket
    val out = run(Seq((1L, 1L), (1L, 5L), (1L, 35L), (2L, 12L)), 10L)
    assert(out.toSeq == Seq(
      (1L, 0L, 2L), (1L, 10L, 0L), (1L, 20L, 0L), (1L, 30L, 1L),
      (2L, 10L, 1L)))
  }

  test("spine is dense per key and totals are conserved") {
    val rows = for { k <- 1L to 20L; i <- 1L to 30L if (i * k) % 7 != 0 }
      yield (k, i * 100L + k)
    val out = run(rows, 100L)
    out.groupBy(_._1).values.foreach { vs =>
      val buckets = vs.map(_._2).sorted
      // dense: consecutive buckets step by exactly the bucket width
      buckets.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 100L)
        case _ =>
      }
    }
    assert(out.map(_._3).sum == rows.size)
  }

  test("deterministic under repartition; invalid bucket rejected") {
    val rows = (1L to 500L).map(i => (i % 7, i * 13))
    val a = run(rows, 50L)
    val b = Resample.fillGaps(rows.toDF("k", "ts_us").repartition(11),
      "k", "ts_us", 50L).as[(Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)
    intercept[IllegalArgumentException] {
      Resample.fillGaps(rows.toDF("k", "ts_us"), "k", "ts_us", 0L)
    }
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the dense mapper-only cell-mean kernels against the
  * groupBy/avg formulation they replaced — in particular the
  * malformed-row rule: a null vector yields a null cell
  * (NearestCellsExpr is null-safe), and the old
  * `groupBy(cell)` silently dropped those rows, so the dense
  * kernel must drop them too instead of crashing on the
  * non-nullable Int decode.
  */
class CentroidAssignSpec extends SparkSpec {

  private def frame(withNull: Boolean) = {
    import spark.implicits._
    val base = Seq(
      (Some(0), Some(Seq(1.0, 2.0, 3.0))),
      (Some(0), Some(Seq(3.0, 2.0, 1.0))),
      (Some(1), Some(Seq(-1.0, 0.5, 0.25))),
      (Some(1), Some(Seq(0.125, -0.5, 8.0))),
      (Some(1), Some(Seq(2.0, 2.0, 2.0))))
    val rows = if (withNull) base :+ ((Option.empty[Int], Option.empty[Seq[Double]]))
    else base
    rows.toDF("cell", "vd")
  }

  test("cellMeans drops null-cell rows instead of crashing (ADVICE r17)") {
    val withNull = CentroidAssign.cellMeans(frame(withNull = true))
    val without = CentroidAssign.cellMeans(frame(withNull = false))
    assert(withNull.map(_._1).toSeq == Seq(0, 1))
    assert(withNull.map(_._2.toSeq).toSeq == without.map(_._2.toSeq).toSeq)
  }

  test("cellMeansDecimal drops null-cell rows instead of crashing") {
    val withNull = CentroidAssign.cellMeansDecimal(frame(withNull = true))
    val without = CentroidAssign.cellMeansDecimal(frame(withNull = false))
    assert(withNull.map(_._1).toSeq == Seq(0, 1))
    assert(withNull.map(_._2.toSeq).toSeq == without.map(_._2.toSeq).toSeq)
  }

  test("cellMeansDecimal int128 accumulation bit-equals the BigDecimal " +
      "reference on randomized data incl. negatives and overflow spills") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import spark.implicits._
    val rnd = new scala.util.Random(181)
    // mixed magnitudes; 1e19 components force the per-term long
    // overflow spill (scale-18 unscaled > 2^63)
    val rows = (0 until 400).map { i =>
      val cell = i % 5
      val v = Array(
        rnd.nextDouble() * 2 - 1,
        (rnd.nextInt(2000) - 1000) / 7.0,
        if (i % 97 == 0) 1.23e19 else rnd.nextGaussian(),
        0.0)
      (cell, v.toSeq)
    }
    val got = CentroidAssign
      .cellMeansDecimal(rows.toDF("cell", "vd").repartition(7))
      .map { case (c, m) => c -> m.toSeq }.toMap
    // reference: straight per-term quantize + BigDecimal chain sum
    val expect = rows.groupBy(_._1).map { case (c, rs) =>
      val dim = rs.head._2.length
      val sums = Array.fill(dim)(JBD.ZERO)
      rs.foreach { case (_, v) =>
        v.indices.foreach { i =>
          sums(i) = sums(i).add(
            JBD.valueOf(v(i)).setScale(18, RoundingMode.HALF_UP))
        }
      }
      c -> sums.map(_.divide(JBD.valueOf(rs.size.toLong), 22,
        RoundingMode.HALF_UP).doubleValue).toSeq
    }
    assert(got.keySet == expect.keySet)
    for ((c, m) <- expect) assert(got(c) == m, s"cell $c")
  }

  test("cellMeans equals the posexplode/groupBy/avg formulation it replaced") {
    val df = frame(withNull = true)
    val dense = CentroidAssign.cellMeans(df).toMap
    val shuffled = df
      .filter(col("cell").isNotNull)
      .select(col("cell").cast("int").as("cell"), posexplode(col("vd")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    assert(dense.keySet == shuffled.keySet)
    for ((c, m) <- shuffled)
      m.zip(dense(c)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"cell $c mean mismatch")
      }
  }
}

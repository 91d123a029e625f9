package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked fence: spikes flagged, bulk untouched, per group") {
    // group a: 1..100 plus spikes -500 and 900; group b: flat, no outliers
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", -500.0), ("a", 900.0)) ++ (1 to 50).map(_ => ("b", 10.0))
    val out = Outliers.iqrFlag(rows.toDF("g", "v"), "v", Seq("g"))
      .as[(String, Double, Boolean)].collect()
    assert(out.filter(_._1 == "a").count(_._3) == 2)
    assert(out.filter(r => r._1 == "a" && r._3).map(_._2).toSet == Set(-500.0, 900.0))
    assert(out.filter(_._1 == "b").forall(!_._3))
  }

  test("global fence (no group cols) and approx path agree on gross spikes") {
    val rows = (1 to 1000).map(_.toDouble) ++ Seq(1e9)
    val exact = Outliers.iqrFlag(rows.toDF("v"), "v", Nil)
      .filter(col("is_outlier")).as[(Double, Boolean)].collect()
    assert(exact.map(_._1).toSet == Set(1e9))
    val approx = Outliers.iqrFlag(rows.toDF("v"), "v", Nil, exact = false)
      .filter(col("is_outlier")).as[(Double, Boolean)].collect()
    assert(approx.map(_._1).contains(1e9))
  }

  test("robustness: the spike does not drag the fence (z-score would)") {
    // one enormous spike among uniform data: mean±3σ flags nothing
    // (σ is inflated by the spike itself); the IQR fence still catches it
    val rows = (1 to 100).map(_ => 50.0) ++ Seq(1e12)
    val flagged = Outliers.iqrFlag(rows.toDF("v"), "v", Nil)
      .filter(col("is_outlier")).as[(Double, Boolean)].collect()
    assert(flagged.map(_._1).toSet == Set(1e12))
  }
}

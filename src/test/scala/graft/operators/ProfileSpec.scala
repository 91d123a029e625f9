package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("a"), None),
    (3L, None, Some(2.5)),
    (4L, Some("b"), Some(2.5)),
    (5L, None, None)).toDF("id", "s", "x")

  test("exact mode: hand-computed per-column counts") {
    val out = Profile.profile(df, exact = true)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("id") == ((5L, 0L, 5L)))
    assert(out("s") == ((5L, 2L, 2L)))  // nulls not in distinct
    assert(out("x") == ((5L, 2L, 2L)))
    assert(out.size == 3)
  }

  test("approx mode: exact-equal at tiny cardinality, and plans no Expand") {
    val out = Profile.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // HLL++ is exact at these cardinalities
    assert(out == Map("id" -> 5L, "s" -> 2L, "x" -> 2L))
    val approxPlan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    // exact mode is the one paying Expand — the documented trade
    val exactPlan =
      Profile.profile(df, exact = true).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan)
  }

  test("single-column and all-null columns profile correctly") {
    val oneCol = Seq.empty[Option[String]].toDF("v")
    val out = Profile.profile(oneCol, exact = true)
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("v", 0L, 0L, 0L)))
    val allNull = Seq(Option.empty[String], None).toDF("v")
    val out2 = Profile.profile(allNull, exact = true)
      .as[(String, Long, Long, Long)].collect()
    assert(out2.toSeq == Seq(("v", 2L, 2L, 0L)))
  }
}

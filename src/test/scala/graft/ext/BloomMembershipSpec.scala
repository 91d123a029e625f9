package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomMembershipSpec extends SparkSpec {
  import spark.implicits._

  private val members = (1L to 500L).map(i => s"key-$i")
  private val nonMembers = (1L to 2000L).map(i => s"other-$i")

  test("no false negatives: every member probes true") {
    val ref = members.toDF("k")
    val bloom = BloomMembership.bloomBytes(ref, col("k"), 500).get
    val missed = ref.filter(!BloomMembership.mightContain(bloom, col("k")))
    assert(missed.count() == 0)
  }

  test("measured false-positive rate stays near the fpp dial") {
    val bloom = BloomMembership
      .bloomBytes(members.toDF("k"), col("k"), 500, fpp = 0.01).get
    val fps = nonMembers.toDF("k")
      .filter(BloomMembership.mightContain(bloom, col("k"))).count()
    // deterministic (xxhash64 + bitset), so this is a fixed measurement,
    // not a flaky statistical assertion; 5x headroom over the 1% dial
    assert(fps <= nonMembers.size * 0.05, s"$fps false positives of ${nonMembers.size}")
  }

  test("sketch bytes are identical under any partitioning (merge is order-free)") {
    val df = members.toDF("k")
    val a = BloomMembership.bloomBytes(df, col("k"), 500).get
    val b = BloomMembership.bloomBytes(df.repartition(7), col("k"), 500).get
    assert(java.util.Arrays.equals(a, b))
  }

  test("probableMatches is a superset of exact matches; decontaminate is sound") {
    val corpus = ((1L to 300L).map(i => i -> s"key-$i") ++
      (301L to 600L).map(i => i -> s"other-$i")).toDF("id", "k")
    val ref = members.toDF("k")
    val probable = BloomMembership
      .probableMatches(corpus, col("k"), ref, col("k"), 500)
      .select("id").as[Long].collect().toSet
    assert((1L to 300L).toSet.subsetOf(probable))
    val surviving = BloomMembership
      .decontaminate(corpus, col("k"), ref, col("k"), 500)
      .select("id").as[Long].collect().toSet
    // sound: no exact member survives; complement: survivors = corpus \ probable
    assert(surviving.intersect((1L to 300L).toSet).isEmpty)
    assert(surviving == (1L to 600L).toSet -- probable)
  }

  test("null keys: never in the set, never a match (equi-join semantics)") {
    // a null among the reference keys must not poison the sketch...
    val ref = (members :+ (null: String)).toDF("k")
    val bloom = BloomMembership.bloomBytes(ref, col("k"), 500).get
    // ...and a null-keyed corpus row must probe definitely-absent
    val corpus = Seq(1L -> "key-1", 2L -> null, 3L -> "other-1").toDF("id", "k")
    val probable = corpus.filter(BloomMembership.mightContain(bloom, col("k")))
      .select("id").as[Long].collect().toSet
    assert(probable.contains(1L) && !probable.contains(2L))
    // decontaminate keeps null-keyed rows (they match nothing)
    val surviving = BloomMembership
      .decontaminate(corpus, col("k"), ref, col("k"), 500)
      .select("id").as[Long].collect().toSet
    assert(surviving.contains(2L) && !surviving.contains(1L))
  }

  test("empty reference set: no probable matches, decontaminate is identity") {
    val corpus = Seq(1L -> "a", 2L -> "b").toDF("id", "k")
    val empty = Seq.empty[String].toDF("k")
    assert(BloomMembership
      .probableMatches(corpus, col("k"), empty, col("k"), 10).count() == 0)
    assert(BloomMembership
      .decontaminate(corpus, col("k"), empty, col("k"), 10).count() == 2)
  }

  test("probe stays in whole-stage codegen (no UDF barrier)") {
    // over a parquet scan: a local relation would be constant-folded
    // away by ConvertToLocalRelation and show no codegen at all
    val bloom = BloomMembership
      .bloomBytes(members.toDF("k"), col("k"), 500).get
    val plan = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(BloomMembership.mightContain(bloom, md5(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan) // the * marks WholeStageCodegen
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}

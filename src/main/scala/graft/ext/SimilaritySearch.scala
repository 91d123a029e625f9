package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Partitioning
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast cross join —
  *    the baseline, correct at any recall, O(|Q|·|C|·d). Right when the
  *    query set is small (the common "probe a corpus" shape).
  *  - [[lshTopK]]: sign-random-projection LSH — L hash tables of m
  *    hyperplane-sign bits; candidates = bucket collisions in any table;
  *    exact cosine re-rank of candidates. Index side scales linearly
  *    (L entries per vector, shuffled on (table, bucket)); collision
  *    probability per bit is 1−θ/π, so per-table recall for angle θ is
  *    (1−θ/π)^m, overall 1−(1−(1−θ/π)^m)^L.
  *
  * Hyperplanes are deterministic (hash-seeded), so results are stable
  * across runs and cluster topologies.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random hyperplane weight for (table, plane, dim). */
  private def planeWeight(t: Int, p: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((t, p, d))
    h.toDouble / Int.MaxValue // ~uniform in [-1, 1]
  }

  /** LSH bucket id of a vector in table t: m sign bits packed to a long. */
  private def bucket(vec: Column, t: Int, m: Int, dim: Int): Column = {
    val bits = (0 until m).map { p =>
      val plane = array((0 until dim).map(d => lit(planeWeight(t, p, d))): _*)
      val dp = aggregate(
        zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dp > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** (table, bucket) keys for all L tables, as an array for explode. */
  def bucketKeys(vec: Column, tables: Int, bits: Int, dim: Int): Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("t"), bucket(vec, t, bits, dim).as("bkt"))
    }: _*)

  /** Exact cosine top-k: each row of `queries` against all of `corpus`
    * (self-matches by id excluded). Output:
    * (query_id, cand_id, cos_sim, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = Partitioning.forCompute(
      corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    rank(scored, k)
  }

  /** LSH-bucketed approximate top-k. Candidates from bucket collisions
    * across L tables, exact-cosine re-ranked. Queries whose buckets are
    * all empty return no rows (increase `tables`/decrease `bits` to
    * trade candidate volume for recall).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      tables: Int = 16,
      bits: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def index(df: DataFrame, id: String, vec: String): DataFrame =
      Partitioning.forCompute(df)
        .select(col(idCol).as(id), col(vecCol).as(vec),
          explode(bucketKeys(col(vecCol), tables, bits, dim)).as("bk"))
        .select(col(id), col(vec), col("bk.t").as("t"), col("bk.bkt").as("bkt"))
    val qi = index(queries, "query_id", "qv")
    val ci = index(corpus, "cand_id", "cv")
    val cands = qi.join(ci,
        Seq("t", "bkt")).where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "cand_id")
    val scored = cands.select(col("query_id"), col("cand_id"),
      round(VectorFunctions.cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    rank(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥
    * threshold, a < b — exact via blocked self-join. At corpus scale,
    * block first (LSH buckets / IVF cells) and verify inside blocks;
    * exact mode is right whenever |corpus|² pair evaluation fits the
    * cluster (it is embarrassingly parallel — shuffle is one broadcast).
    */
  def cosineNearDuplicates(
      corpus: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = Partitioning.forCompute(
      corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb")))
    broadcast(a).join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN
    * scale path: partition the corpus into cells around centroids
    * (mini k-means, deterministic hash-seeded init), search only the
    * `nProbe` cells nearest each query.
    *
    * All plan-level: centroids are a broadcast-size list (nCells ≪
    * corpus), assignment is a broadcast join + argmin, training runs
    * `iters` Lloyd rounds over the corpus (each one scan + tiny agg).
    * Recall/cost dial: nProbe/nCells ≈ fraction of corpus scanned.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = Partitioning.forCompute(
      corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))).cache()

    // deterministic init: cells seeded by hash-scattered corpus vectors
    var centroids: Array[(Int, Seq[Double])] = c
      .select(col("cand_id"), transform(col("cv"), _.cast("double")).as("v"))
      .orderBy(md5(col("cand_id").cast("string"))).limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }

    def centroidLit(cents: Array[(Int, Seq[Double])]) =
      array(cents.map { case (i, v) =>
        struct(lit(i).as("cell"), array(v.map(lit): _*).as("cv0"))
      }: _*)

    def nearestCells(vec: Column, cents: Array[(Int, Seq[Double])], take: Int): Column = {
      val scored = transform(centroidLit(cents), cent =>
        struct(
          aggregate(zip_with(vec, cent.getField("cv0"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), _ + _).as("d2"),
          cent.getField("cell").as("cell")))
      slice(array_sort(scored), 1, take)
    }

    // Lloyd rounds: assign to nearest cell, recompute cell means
    for (_ <- 1 to iters) {
      val assigned = c.select(col("cv"),
        element_at(nearestCells(col("cv"), centroids, 1), 1)
          .getField("cell").as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("d"), col("m"))))
          .as("dm"))
        .select(col("cell"), transform(col("dm"), _.getField("m")).as("v"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
      if (means.nonEmpty) centroids = means
    }

    val indexed = c.select(col("cand_id"), col("cv"),
      element_at(nearestCells(col("cv"), centroids, 1), 1)
        .getField("cell").as("cell"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(transform(nearestCells(col("qv"), centroids, nProbe),
          _.getField("cell"))).as("cell"))
    val scored = broadcast(probed).join(indexed, Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    rank(scored, k)
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }
}

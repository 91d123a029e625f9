package graft.ext

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.plans.{ThetaSketchAgg, ThetaUnionAgg}

/** Theta-sketch SET-OPERATION analytics — corpus overlap estimation.
  *
  * The question this tier answers at 100 TB: "how much does corpus A
  * overlap corpus B?" — shared vocabulary, shared URLs, shared doc
  * fingerprints across sources/snapshots/mixtures. Exact answers need
  * a distinct-pair join per source pair (p² passes over raw data);
  * theta sketches collapse each group to a few KB ONCE (one hash
  * aggregate), then ANY pairwise intersection/difference/Jaccard is
  * driver-cheap set math over stored sketches — including rollups
  * (sketches union losslessly, [[graft.plans.ThetaUnionAgg]]).
  *
  * HLL ([[Sketches]]) cannot do this: HLL union is sound but there is
  * no HLL intersection — inclusion-exclusion on HLL estimates has
  * unbounded relative error for small intersections. Theta's
  * intersection returns a real sketch with its own error bounds
  * (Dasgupta et al., "Theta-Sketch Framework", and the Apache
  * DataSketches set-operation docs), which is what q121 gates: the
  * EXACT overlap must sit inside the sketch's own [lb, ub] band.
  *
  * Scalar set ops run as UDFs — deliberately: they execute on
  * ALREADY-AGGREGATED rows (one per group pair — bounded by the
  * grouping cardinality, never by data volume), so codegen buys
  * nothing; the aggregates, which DO see every row, are native
  * [[TypedImperativeAggregate]]s.
  */
object ThetaSketches {

  /** Per-group theta sketch over a value column (string/long/int/
    * binary). `lgK` = log2 nominal entries; estimates are EXACT below
    * 2^lgK distinct values, ~1/sqrt(2^lgK) RSE above.
    */
  def sketchAgg(value: Column, lgK: Int = 12): Column =
    bridge.column(ThetaSketchAgg(bridge.expression(value), lgK)
      .toAggregateExpression())

  /** Union-merge stored sketches (the rollup aggregate). */
  def unionAgg(sketch: Column, lgK: Int = 12): Column =
    bridge.column(ThetaUnionAgg(bridge.expression(sketch), lgK)
      .toAggregateExpression())

  private def heap(b: Array[Byte]): Sketch =
    CompactSketch.heapify(Memory.wrap(b))

  /** Distinct-count estimate of a stored sketch. */
  val estimate: UserDefinedFunction =
    udf((b: Array[Byte]) => heap(b).getEstimate)

  /** (estimate, lb, ub) of a stored sketch at `numStdDev`. */
  def estimateBounds(numStdDev: Int = 3): UserDefinedFunction =
    udf((b: Array[Byte]) => {
      val s = heap(b)
      (s.getEstimate, s.getLowerBound(numStdDev), s.getUpperBound(numStdDev))
    })

  /** Intersection of two stored sketches →
    * (estimate, lb, ub) at `numStdDev` standard deviations.
    */
  def intersectBounds(numStdDev: Int = 3): UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(heap(a))
      i.intersect(heap(b))
      val r = i.getResult
      (r.getEstimate, r.getLowerBound(numStdDev), r.getUpperBound(numStdDev))
    })

  /** A-not-B difference estimate of two stored sketches. */
  val aNotBEstimate: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val d = SetOperation.builder().buildANotB()
      d.aNotB(heap(a), heap(b)).getEstimate
    })

  /** Pairwise vocabulary-overlap table over `sourceCol` groups:
    * `(src_a, src_b, est_overlap, lb, ub)` for every unordered pair.
    * One hash aggregate builds the per-source sketches; the pair
    * expansion is a p×p join of p AGGREGATED rows (p = #groups) — the
    * raw data is touched exactly once regardless of pair count.
    */
  def vocabOverlap(docs: DataFrame, textCol: String, sourceCol: String,
      lgK: Int = 12, numStdDev: Int = 3): DataFrame = {
    val toks = docs
      .select(col(sourceCol).as("source"),
        explode(DuplicateSpans.tokens(col(textCol))).as("tok"))
    val perSource = toks.groupBy(col("source"))
      .agg(sketchAgg(col("tok"), lgK).as("sk"))
    perSource.alias("a")
      .join(perSource.alias("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        intersectBounds(numStdDev)(col("a.sk"), col("b.sk")).as("r"))
      .select(col("src_a"), col("src_b"), col("r._1").as("est_overlap"),
        col("r._2").as("lb"), col("r._3").as("ub"))
  }

  /** q121's invariant frame: rows where the EXACT overlap (computed by
    * a distinct token equi-join — the plan a sketch-less engine would
    * run for every question) escapes the sketch's own [lb, ub] band,
    * plus per-source marginals outside their bands. Empty = the
    * estimator's error contract holds corpus-wide.
    */
  def vocabOverlapViolations(docs: DataFrame, textCol: String,
      sourceCol: String, lgK: Int = 12, numStdDev: Int = 3): DataFrame = {
    val toks = docs
      .select(col(sourceCol).as("source"),
        explode(DuplicateSpans.tokens(col(textCol))).as("tok"))
      .distinct()
    val est = vocabOverlap(docs, textCol, sourceCol, lgK, numStdDev)
    val exact = toks.alias("x")
      .join(toks.alias("y"),
        col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val pairViolations = est.join(exact, Seq("src_a", "src_b"), "left")
      .withColumn("exact_overlap", coalesce(col("exact_overlap"), lit(0L)))
      .filter(col("exact_overlap") < col("lb") ||
        col("exact_overlap") > col("ub"))
      .select(lit("pair").as("kind"), col("src_a"), col("src_b"),
        col("exact_overlap").cast("double").as("exact"),
        col("lb"), col("ub"))
    val perSource = docs
      .select(col(sourceCol).as("source"),
        explode(DuplicateSpans.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"))
      .agg(sketchAgg(col("tok"), lgK).as("sk"),
        count_distinct(col("tok")).as("exact_n"))
    val marginViolations = perSource
      .select(col("source"), col("exact_n"),
        estimateBounds(numStdDev)(col("sk")).as("r"))
      .filter(col("exact_n") < col("r._2") || col("exact_n") > col("r._3"))
      .select(lit("marginal").as("kind"), col("source").as("src_a"),
        col("source").as("src_b"),
        col("exact_n").cast("double").as("exact"),
        col("r._2").as("lb"), col("r._3").as("ub"))
    pairViolations.unionByName(marginViolations)
  }
}

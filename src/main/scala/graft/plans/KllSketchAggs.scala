package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native KLL quantile-sketch aggregates (Apache DataSketches — the
  * library Spark's own `hll_sketch_agg` ships). KLL (Karnin-Lang-
  * Liberty 2016) is the mergeable quantile sketch: a few KB per group
  * answers any rank/quantile query with a PROVEN normalized-rank-error
  * bound, and sketches union losslessly — the property Spark's
  * built-in `approx_percentile` (GK) lacks a stored/mergeable form
  * for. Same persist-fine/merge-coarse pattern as the HLL and theta
  * tiers ([[graft.ext.Sketches]], [[ThetaSketchAgg]]): per-(group,
  * week) sketches stored once answer any coarser percentile rollup by
  * merging kilobytes instead of rescanning raw values.
  *
  * Shape follows Spark's `HllSketchAgg`: a [[TypedImperativeAggregate]]
  * with map-side partials; the buffer serializes as a compact sketch
  * on shuffle, so per-group sketching is one ordinary hash aggregate.
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case FloatType   => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType    => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case dt => throw new IllegalStateException(
        s"kll_sketch_agg: unsupported input type ${dt.simpleString}")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merge of STORED KLL sketches (binary column) — the rollup half:
  * per-(type, week) sketches stored once answer the per-type (or
  * global) percentile question by merging kilobytes.
  */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge_agg"
}

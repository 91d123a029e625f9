package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Theta-sketch aggregates (Apache DataSketches — the library
  * Spark's own `hll_sketch_agg` ships). Theta is the sketch family
  * that supports SET OPERATIONS — union, intersection, difference —
  * which HLL cannot: an HLL pair gives you |A∪B| but no sound
  * |A∩B|. The aggregate follows the exact shape of Spark's built-in
  * `HllSketchAgg` (a [[TypedImperativeAggregate]] with map-side
  * partials; the buffer serializes as a compact sketch on shuffle),
  * so per-group sketching is one ordinary hash aggregate.
  *
  * Value hashing: strings feed their UTF-8 bytes, integers widen to
  * long — consistent across [[ThetaSketchAgg]] runs, which is the
  * only contract set operations need.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType => buffer.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case dt => throw new IllegalStateException(
        s"theta_sketch_agg: unsupported input type ${dt.simpleString}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** Union-merge of STORED theta sketches (binary column) — the rollup
  * half of the persist-fine/merge-coarse pattern ([[graft.ext.Sketches]]
  * for the HLL twin): per-(source,day) sketches stored once answer any
  * coarser distinct/overlap rollup by merging kilobytes.
  */
case class ThetaUnionAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      buffer.union(CompactSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, ExpressionDescription, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Hash-aggregate-friendly MIN/MAX over ANY orderable type.
  *
  * Spark's declarative Min/Max keep the running best in the aggregation
  * buffer, and a struct-typed buffer field is not mutable-buffer
  * compatible — so every `min(struct(...))` / `max(struct(...))`
  * argmin/argmax (the engine's standard deterministic-tiebreak idiom)
  * silently plans as **SortAggregate**: a full sort of the stream below
  * the partial AND above the exchange, with interpreted comparisons —
  * measured at ~2.5 s per label-propagation round at sf0.1 where the
  * hash path costs milliseconds (PartitionPreserveSpec's sibling
  * finding, r15).
  *
  * This TypedImperativeAggregate keeps ONE buffered value per group
  * (the running best, compared with the type's interpreted ordering)
  * inside ObjectHashAggregate — no sorts on either side of the
  * exchange, partial/merge exactly like Min/Max, O(1) state per group.
  */
abstract class MinMaxAnyBase extends TypedImperativeAggregate[MinMaxAny.Buf] {
  def child: Expression
  /** true → keep the larger value (max); false → min. */
  def keepGreater: Boolean

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj =
    UnsafeProjection.create(Seq(BoundReference(0, child.dataType, nullable = true)))
  @transient private lazy val outRow = new UnsafeRow(1)

  override def createAggregationBuffer(): MinMaxAny.Buf = new MinMaxAny.Buf(null)

  private def better(cand: Any, best: Any): Boolean =
    best == null || (if (keepGreater) ordering.compare(cand, best) > 0
                     else ordering.compare(cand, best) < 0)

  override def update(buf: MinMaxAny.Buf, input: InternalRow): MinMaxAny.Buf = {
    val v = child.eval(input)
    if (v != null && better(v, buf.value)) buf.value = InternalRow.copyValue(v)
    buf
  }

  override def merge(buf: MinMaxAny.Buf, other: MinMaxAny.Buf): MinMaxAny.Buf = {
    if (other.value != null && better(other.value, buf.value)) buf.value = other.value
    buf
  }

  override def eval(buf: MinMaxAny.Buf): Any = buf.value

  override def serialize(buf: MinMaxAny.Buf): Array[Byte] =
    if (buf.value == null) Array.emptyByteArray
    else proj(InternalRow(buf.value)).copy().getBytes

  override def deserialize(bytes: Array[Byte]): MinMaxAny.Buf =
    if (bytes.isEmpty) new MinMaxAny.Buf(null)
    else {
      outRow.pointTo(bytes, bytes.length)
      new MinMaxAny.Buf(InternalRow.copyValue(outRow.get(0, child.dataType)))
    }
}

object MinMaxAny {
  /** Mutable single-value buffer (null = no non-null input seen). */
  final class Buf(var value: Any)
}

@ExpressionDescription(
  usage = "_FUNC_(v) - the maximum of v under the type's natural ordering, via hash aggregation.")
case class MaxAny(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0) extends MinMaxAnyBase {
  override def keepGreater: Boolean = true
  override def prettyName: String = "graft_max_any"
  override def withNewMutableAggBufferOffset(newOffset: Int): MaxAny =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxAny =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MaxAny =
    copy(child = newChildren.head)
}

@ExpressionDescription(
  usage = "_FUNC_(v) - the minimum of v under the type's natural ordering, via hash aggregation.")
case class MinAny(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0) extends MinMaxAnyBase {
  override def keepGreater: Boolean = false
  override def prettyName: String = "graft_min_any"
  override def withNewMutableAggBufferOffset(newOffset: Int): MinAny =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinAny =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinAny =
    copy(child = newChildren.head)
}

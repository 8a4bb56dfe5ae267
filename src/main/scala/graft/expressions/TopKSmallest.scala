package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bounded "k smallest longs per group" aggregate: the map-side-partial
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k` → `collect_list` idiom. The window route shuffles EVERY row
  * and sorts each partition; this aggregate keeps an O(k) max-heap per
  * group, participates in partial aggregation (each map task ships at
  * most k values per group into the exchange), and merges like any
  * other aggregate — the same contract as the TopKPerKey physical
  * operator, packaged as an expression so it can ride ONE hash
  * aggregate next to sibling aggregates (count, sum) with no extra
  * exchange, sort, or self-join.
  *
  * Returns the group's k smallest input values as an ASCENDING array
  * (duplicates preserved — feed a distinct stream when set semantics
  * are wanted). Nulls are skipped; an all-null/empty group yields an
  * empty array. Top-k of a multiset distributes over union, so the
  * result is exact and partition-order independent.
  */
@ExpressionDescription(
  usage = "_FUNC_(v, k) - k smallest long values of the group, ascending.")
case class TopKSmallestLongs(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSmallestLongs.Heap] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_top_k_longs: k must be an integer literal, got $other")
  }
  require(kExpr.foldable, "graft_top_k_longs: k must be foldable")

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && kExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k_longs expects (BIGINT, INT literal), got " +
        s"(${child.dataType.catalogString}, ${kExpr.dataType.catalogString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_longs"

  override def createAggregationBuffer(): TopKSmallestLongs.Heap =
    new TopKSmallestLongs.Heap(k)

  override def update(buf: TopKSmallestLongs.Heap, input: InternalRow): TopKSmallestLongs.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKSmallestLongs.Heap, other: TopKSmallestLongs.Heap): TopKSmallestLongs.Heap = {
    var i = 0
    while (i < other.size) { buf.offer(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKSmallestLongs.Heap): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: TopKSmallestLongs.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKSmallestLongs.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKSmallestLongs.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSmallestLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSmallestLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSmallestLongs =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKSmallestLongs {
  /** Bounded binary max-heap over a primitive long array: root = the
    * largest kept value, so replacing it when a smaller value arrives
    * maintains "the k smallest seen". O(log k) per offer past the
    * first k, zero boxing.
    */
  final class Heap(k: Int) {
    val values = new Array[Long](math.max(k, 1))
    var size = 0

    def offer(v: Long): Unit = {
      if (k <= 0) return
      if (size < k) {
        // grow phase: append then sift up
        var i = size
        values(i) = v
        size += 1
        while (i > 0 && values((i - 1) / 2) < values(i)) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (v < values(0)) {
        // replace the max, sift down
        values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && values(l) > values(m)) m = l
          if (r < size && values(r) > values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }
    }

    def sortedValues: Array[Long] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      out
    }
  }
}

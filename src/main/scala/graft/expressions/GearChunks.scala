package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear-hash content-defined chunking (CDC) — the rolling-hash
  * boundary rule behind rsync/LBFS-style dedup stores and chunk-level
  * corpus dedup: a boundary falls AFTER byte i when the low `maskBits`
  * bits of the gear state are zero, where the state folds one table
  * lookup per byte:
  *
  *   h ← (h << 1) + gear[b]     (wrapping 64-bit)
  *
  * Content-defined means insert/delete edits only reshuffle the
  * chunks NEAR the edit — fixed-size chunking shifts every boundary
  * after it, destroying downstream fingerprint matches (the property
  * that makes CDC the right chunking for near-identical documents).
  * Expected chunk length is 2^maskBits bytes; no min/max clamps — the
  * pure gear rule keeps the state machine exactly replayable by an
  * external engine (the q322 oracle replays it as a recursive CTE in
  * HUGEINT mod 2^64, with the gear table re-derived from the same
  * md5 formula).
  *
  * The gear table is md5-derived (`Hashing.hash64Local("gear:"+b)`) —
  * engine-portable like every hash in this codebase. One compiled
  * pass per row (the MinhashKernel discipline): no per-byte lambda
  * interpretation, no intermediate arrays beyond the output.
  */
object GearKernel {

  val Gear: Array[Long] =
    Array.tabulate(256)(b => graft.functions.Hashing.hash64Local(s"gear:$b"))

  /** Chunks of `text`'s UTF-8 bytes: array of (fingerprint, length)
    * structs in order; fingerprint = the engine's 60-bit md5 hash of
    * the chunk bytes. Empty text → empty array; a final partial chunk
    * (no closing boundary) is emitted like any other.
    */
  def chunks(text: UTF8String, maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    val mask = (1L << maskBits) - 1
    val out = new java.util.ArrayList[GenericInternalRow]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      if ((h & mask) == 0L) {
        val chunk = java.util.Arrays.copyOfRange(bytes, start, i + 1)
        out.add(new GenericInternalRow(Array[Any](
          MinhashKernel.hash60(chunk), i + 1 - start)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) {
      val chunk = java.util.Arrays.copyOfRange(bytes, start, bytes.length)
      out.add(new GenericInternalRow(Array[Any](
        MinhashKernel.hash60(chunk), bytes.length - start)))
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_gear_chunks(text, maskBits)` → array<struct<fp:bigint,
  * len:int>> — CDC chunk fingerprints via [[GearKernel]].
  */
case class GearChunks(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: first argument must be string")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: maskBits must be an integer literal")
    else {
      // JVM long shifts are mod 64: maskBits ≥ 64 would make the mask
      // (1L << maskBits) - 1 collapse to 0 — a boundary after EVERY
      // byte — and negatives likewise degenerate. Misuse must fail at
      // analysis time, not silently chunk per byte.
      val m = right.eval()
      if (m == null || m.asInstanceOf[Int] < 1 || m.asInstanceOf[Int] > 62)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: maskBits must be in [1, 62], got $m")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)

  private lazy val maskBits: Int = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(t: Any, m: Any): Any =
    GearKernel.chunks(t.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expressions.GearKernel.chunks($t, $maskBits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GearChunks =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_gear_chunks"
}

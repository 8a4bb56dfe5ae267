package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Query a serialized count-min sketch (the binary produced by Spark's
  * built-in `count_min_sketch` aggregate) for one item's estimated
  * count.
  *
  * Spark ships the MERGEABLE sketch aggregate but no expression to read
  * the result inside a plan — forcing a driver collect + closure capture
  * (an eager action, and a serialization hazard). This expression keeps
  * the whole sketch-then-verify pattern declarative: the one-row sketch
  * relation broadcast-joins onto the probe side and each row asks the
  * sketch for its estimate (q185's heavy-hitter prune).
  *
  * The CMS guarantee is one-sided (estimate ≥ true count), which is what
  * makes sketch-pruned EXACT answers possible: the pruned candidate set
  * is a superset of the true answer, so downstream exact verification
  * returns exactly the true result no matter how coarse the sketch.
  *
  * Deserializing ~eps⁻¹·ln(1/δ) longs per row would swamp the probe, so
  * the static entry memoizes the last deserialized sketch PER THREAD
  * keyed on the byte array's object identity — a broadcast row feeds
  * every probe in a partition the same array instance, making the cache
  * hit rate ~100% without any cross-thread coordination.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == BinaryType &&
      (right.dataType == LongType || right.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, bigint|string), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    CmsEstimate.estimate(sk.asInstanceOf[Array[Byte]], item)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, x) => {
      val cls = CmsEstimate.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.estimate($s, $x);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cms_estimate"
}

object CmsEstimate {

  private val lastSketch = new ThreadLocal[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]

  private def deserialize(bytes: Array[Byte]): org.apache.spark.util.sketch.CountMinSketch = {
    val cached = lastSketch.get()
    if (cached != null && (cached._1 eq bytes)) cached._2
    else {
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      lastSketch.set((bytes, cms))
      cms
    }
  }

  /** Static entry for generated code. */
  def estimate(bytes: Array[Byte], item: Any): Long = {
    val cms = deserialize(bytes)
    item match {
      case s: UTF8String => cms.estimateCount(s.toString)
      case other => cms.estimateCount(other)
    }
  }
}

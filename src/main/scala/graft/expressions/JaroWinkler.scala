package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity over UTF-8 BYTES, engine-portable.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity`
  * (jarowinkler-cpp), verified bit-exact over a 5000-pair mutation
  * fuzz plus unicode probes. The three conventions that differ from
  * "textbook" presentations, all required for parity:
  *
  *  - operates on UTF-8 bytes, not code points ('héllo' vs 'hello'
  *    compares 6 bytes against 5);
  *  - the transposition count is FLOORED: t = ⌊(mismatched matched
  *    positions)/2⌋ — the classic half-count yields half-integers and
  *    systematically lower scores;
  *  - either input empty ⇒ 0.0 (including both empty, where classic
  *    Jaro says 1.0); prefix boost l·0.1·(1−jaro) with l ≤ 4 applies
  *    only when jaro > 0.7.
  *
  * Cost is O(|a|·window) per pair with two small boolean scratch
  * arrays — callers are expected to bound candidate pairs by blocking
  * (see q253) exactly as with any similarity join; the expression
  * itself stays inside WholeStageCodegen via a static kernel call.
  */
object JaroWinklerKernel {

  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = (if (l1 > l2) l1 else l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window < l2 - 1) i + window else l2 - 1
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = (trans / 2).toDouble
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxp = math.min(4, math.min(l1, l2))
      while (l < maxp && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** `graft_jaro_winkler(a, b)` → double in [0, 1], codegen'd via
  * [[JaroWinklerKernel]].
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.expressions.JaroWinklerKernel.jw($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

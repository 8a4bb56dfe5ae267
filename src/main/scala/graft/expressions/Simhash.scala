package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One compiled pass for SimHash — the bit-balance vote over the
  * distinct-token hash set. The Column-composed formulation (one
  * `aggregate` fold per bit over a shared `transform(tokens, md5)`)
  * leans on common-subexpression elimination to avoid re-hashing every
  * token once per bit; higher-order functions are CodegenFallback, so
  * whether CSE fires depends on the surrounding plan — measured 17 s
  * vs ~2 s at sf0.1 when it didn't (q363's RDD-rank pipeline). A
  * kernel has no such cliff: md5 once per distinct token, all bit
  * balances updated in one tight loop.
  *
  * Semantics are pinned ≡ the composed form (SimhashSpec):
  * Spark-`trim` (0x20 only) + `\s+` split (the ShingleHashes
  * tokenizer), DISTINCT tokens, h = md5-60-bit (`MinhashKernel
  * .hash60` = `Hashing.hash64` = the engine-portable hash), bit b of
  * the result set iff strictly more distinct tokens have bit b set
  * than unset.
  */
object SimhashKernel {

  def simhash(text: UTF8String, bits: Int): Long = {
    val s = text.toString
    var b0 = 0
    var e0 = s.length
    while (b0 < e0 && s.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && s.charAt(e0 - 1) == ' ') e0 -= 1
    val toks = s.substring(b0, e0).split("\\s+", -1)
    val seen = new java.util.HashSet[String]
    val bal = new Array[Long](bits)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = MinhashKernel.hash60(toks(i))
        var b = 0
        while (b < bits) { bal(b) += ((h >>> b) & 1L) * 2 - 1; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (bal(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** `graft_simhash(text, bits)` → long — [[SimhashKernel]]. */
case class Simhash(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: first argument must be string")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: bits must be an integer literal")
    else {
      val b = right.eval()
      // the hash is 60-bit; bits > 60 would vote on constant-zero bits
      // (balance = −|tokens| → bit clear) — legal but meaningless, and
      // bits > 63 would overflow the long. Fail at analysis time.
      if (b == null || b.asInstanceOf[Int] < 1 || b.asInstanceOf[Int] > 60)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: bits must be in [1, 60], got $b")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType

  private lazy val bits: Int = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(t: Any, b: Any): Any =
    SimhashKernel.simhash(t.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expressions.SimhashKernel.simhash($t, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Simhash =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_simhash"
}

package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind `graft_nfc`: Unicode NFC canonical composition.
  *
  * Web-scraped corpora mix composed (U+00E9 'é') and decomposed
  * (U+0065 U+0301 'e'+◌́) encodings of the same visible text; every
  * hash-keyed operator in the engine (exact dedup fingerprints,
  * shingle/MinHash LSH, token counting) treats those byte sequences as
  * distinct, so curation normalizes to NFC first. The JDK's
  * `java.text.Normalizer` implements Unicode TR-15 canonical
  * composition — the same algorithm behind DuckDB's `nfc_normalize`
  * and Python's `unicodedata.normalize('NFC', …)`, which is what makes
  * the result engine-portable and oracle-checkable.
  *
  * The quick-check fast path matters at corpus scale: NFC-normal text
  * (ASCII in particular) is detected without allocating, so the common
  * case costs one scan of the string and zero copies.
  */
object NfcKernel {

  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // Normalizer.isNormalized is the TR-15 quick-check: a pure scan,
    // no allocation. ASCII and already-composed text return here.
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` → string: Unicode NFC canonical composition
  * (TR-15), codegen'd via [[NfcKernel]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: argument must be string")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override protected def nullSafeEval(t: Any): Any =
    NfcKernel.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.NfcKernel.nfc($t)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

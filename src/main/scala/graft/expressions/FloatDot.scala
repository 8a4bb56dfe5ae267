package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric-array columns (each side
  * independently array<float> or array<double> — r16 widened from
  * float-only so double-dequant vectors and literal hyperplane arrays
  * ride the same kernel).
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, _+_)` —
  * products in double, accumulated left-to-right — but compiled inside
  * WholeStageCodegen as a tight primitive loop. The higher-order-function
  * form interprets two lambdas per element with boxing (~10× slower on
  * 64-wide embeddings), because HOFs have no codegen path.
  *
  * Contract: array elements are non-null (embedding columns); lengths are
  * taken as min(len(a), len(b)), matching zip_with-over-equal-lengths.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDouble(dt: DataType) = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemOk(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDouble(left.dataType)
    val yd = isDouble(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, dt: DataType) =
        if (isDouble(dt)) s"$arr.getDouble($i)"
        else s"((double) $arr.getFloat($i))"
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${get(x, left.dataType)} * ${get(y, right.dataType)};
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for float-vector math.
 *
 * The composable route (`zip_with` + `aggregate`) works but both higher-order
 * functions are `CodegenFallback` — every row pays interpreted-lambda and
 * boxing overhead, which dominates brute-force ANN scans. These expressions
 * generate a tight primitive loop inside whole-stage codegen instead
 * (preference order (b) of the build rules: a custom `Expression` with
 * `doGenCode` beats composed-but-interpreted built-ins when the operator is
 * on the hot path).
 *
 * Semantics match the HOF formulation bit-for-bit: elements are widened
 * float→double and accumulated left-to-right in a double.
 */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Codegen'd dot product of two `array<float>` columns, accumulated in
    * double (identical semantics to the zip_with/aggregate formulation). */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (l2normNative(a) * l2normNative(b))
}

// Nested under org.apache.spark.sql because ImplicitCastInputTypes'
// signature mentions the private[sql] AbstractDataType.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * The higher-order-function spelling (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) is CodegenFallback — every element hop is an interpreted
  * Invoke, which is fatal when the expression runs once per candidate
  * PAIR (q35/q36 similarity joins). This expression emits a tight
  * primitive loop inside WholeStageCodegen instead.
  *
  * The fold runs in index order with a plain `+=` on equal-length
  * inputs, exactly the arithmetic sequence of the HOF spelling, so
  * results match it bit-for-bit there (oracle parity keeps holding at
  * round(…, 4)). On UNEQUAL lengths the HOF spelling null-pads the
  * short side (`zip_with` → null product → null sum), so this
  * expression returns null too — a silent min-length truncation would
  * turn a malformed embedding into a plausible number.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      null
    } else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

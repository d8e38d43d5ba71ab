package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the integer dot product of two
  * array<long> columns.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), ...)`)
  * is correct but interpreted: higher-order functions sit outside
  * whole-stage codegen and allocate a lambda frame per element. The
  * embedding operators evaluate millions of dot products (24 SRP
  * planes per vector + one per candidate pair), so this is exactly
  * the case where a custom `Expression` with `doGenCode` — a tight
  * primitive `long` loop inlined into the generated stage — is the
  * right tool.
  *
  * Semantics: both inputs must have equal length (graft's quantized
  * vectors and SRP planes are fixed-dim); null inputs yield null.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $l and $r")
    }

  override def dataType: DataType = LongType

  // a null ELEMENT nulls the result even when both arrays are
  // non-null, so the expression is nullable regardless of children
  override def nullable: Boolean = true

  override def prettyName: String = "long_dot"

  // A null element nulls the result — matching the aggregate/zip_with
  // twin, where NULL poisons the accumulator. Length mismatch THROWS,
  // which is a DELIBERATE stricter divergence from the twin (zip_with
  // null-pads the shorter array, so the twin would return NULL): a
  // truncated dot would mask an upstream dimensionality bug with a
  // plausible partial sum.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"long_dot: mismatched lengths ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "long_dot: mismatched lengths (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object NativeDot {
  /** Column API for LongDotProduct. */
  def dot(a: Column, b: Column): Column =
    ExpressionBridge.column(LongDotProduct(
      ExpressionBridge.expression(a), ExpressionBridge.expression(b)))
}

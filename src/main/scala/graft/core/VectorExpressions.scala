package graft.core

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Dot product of two array<double> columns as a native codegen expression.
 *
 * Why custom: Spark's higher-order functions (`zip_with` + `aggregate`)
 * are CodegenFallback (interpreted closures per element), and unrolling
 * element_at chains explodes generated-code size for wide vectors. A tight
 * generated loop keeps the similarity kernels inside whole-stage codegen —
 * the preferred "custom Expression" tier for operators Spark lacks.
 *
 * Summation is strictly left-to-right in element order, so results are
 * bit-identical to any sequential implementation (e.g. the DuckDB oracle).
 * Both inputs must be non-null array<double> of equal length.
 */
case class DoubleArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // UnsafeArrayData.getDouble has no bounds check — a shorter right array
    // would silently read adjacent row memory. Fail loudly instead.
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"double_array_dot: length mismatch ${n} vs ${y.numElements()}")
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double ${ev.value}_sum = 0.0;
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "double_array_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Matches `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  * exactly — sequential accumulation in array order (deterministic,
  * cross-engine exact), null when lengths differ or an element is null
  * (the lambda chain poisons the accumulator the same way) — but runs as
  * one static call inside whole-stage codegen instead of ~2·dim
  * interpreted lambda evals per pair. The pairwise-similarity operators
  * call this once per candidate PAIR, which is where the interpreted
  * overhead multiplies.
  */
object VectorKernel {
  /** Sentinel-free boxed result: null mirrors the lambda-chain null. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("graftDot")
      s"""
         java.lang.Double $boxed = graft.functions.VectorKernel.dot($a, $b);
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.doubleValue(); }
       """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

object DotProduct {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

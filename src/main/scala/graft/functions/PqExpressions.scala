package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance computation for product quantization: squared L2
  * between a FULL query vector and the RECONSTRUCTION of a PQ code
  * (per-subspace codebook centroid lookup). One static call inside
  * whole-stage codegen per (query, code) pair; the codebooks ride the
  * serialized expression once per stage (m·ksub·dsub doubles — KB-scale).
  *
  * The point of PQ at 100 TB is not FLOPs — it is that the corpus side of
  * the candidate scan carries m small ints (≈ m bytes semantically)
  * instead of `dim` doubles: ~50–100× less storage/shuffle per vector.
  */
object PqKernel {
  /** cb(s)(k) is the dsub-dim centroid k of subspace s; code length m must
    * equal cb.length and the query dim must equal m·dsub, else null. */
  def adc(code: ArrayData, q: ArrayData,
      cb: Array[Array[Array[Double]]]): java.lang.Double = {
    val m = cb.length
    if (code.numElements() != m || m == 0) return null
    val dsub = cb(0)(0).length
    if (q.numElements() != m * dsub) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (code.isNullAt(s)) return null
      val k = code.getInt(s)
      if (k < 0 || k >= cb(s).length) return null
      val ctr = cb(s)(k)
      val off = s * dsub
      var i = 0
      while (i < dsub) {
        val t = q.getDouble(off + i) - ctr(i)
        acc += t * t
        i += 1
      }
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class PqAdc(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(code: Any, q: Any): Any =
    PqKernel.adc(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val boxed = ctx.freshName("graftAdc")
      s"""
         java.lang.Double $boxed = graft.functions.PqKernel.adc($code, $q, $ref);
         if ($boxed == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $boxed.doubleValue(); }
       """
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
}

object PqAdc {
  def column(code: Column, query: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqAdc(
      ExpressionUtils.expression(code), ExpressionUtils.expression(query),
      codebooks))
}

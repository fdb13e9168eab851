package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Interpreted/codegen kernel behind [[ArrayMightContainBloom]]. */
object BloomKernel {
  /** True iff ANY element of the long array might be in the filter.
    * No false negatives: a true member always answers true. */
  def mightContainAny(arr: ArrayData, bf: BloomFilter): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  def deserialize(bits: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))
}

/** `array_might_contain_bloom(array<bigint>)`: true iff any element MIGHT
  * be in the fixed Bloom filter — the probabilistic sibling of
  * [[ArrayOverlapsSet]] for reference sets too large to ship as sorted
  * longs (a Bloom filter at 1% fpp costs ~1.2 bytes/element vs 8, an
  * order of magnitude more headroom under the same broadcast budget).
  *
  * One-sided error only: false positives possible, false NEGATIVES never —
  * which is exactly the contract a prefilter needs (see
  * [[graft.ext.Dedup.decontaminateBloom]]: bloom prunes, an exact join
  * confirms, the composition is exact). The serialized filter rides the
  * expression as a `Seq[Byte]` (primitive-backed `ArraySeq.ofByte`, value
  * equality for Catalyst transforms); the deserialized filter is a lazy
  * transient, shipped once per executor via the codegen reference array. */
case class ArrayMightContainBloom(child: Expression, bits: Seq[Byte])
  extends UnaryExpression {

  @transient private lazy val bf: BloomFilter =
    BloomKernel.deserialize(bits.toArray)

  override def prettyName: String = "array_might_contain_bloom"
  override def dataType: DataType = BooleanType

  override def nullSafeEval(arr: Any): Any =
    BloomKernel.mightContainAny(arr.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BloomKernel.mightContainAny($arr, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): ArrayMightContainBloom =
    copy(child = c)
}

object ArrayMightContainBloom {
  def column(arr: Column, bf: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    ExpressionUtils.column(ArrayMightContainBloom(
      ExpressionUtils.expression(arr), bos.toByteArray.toSeq))
  }
}

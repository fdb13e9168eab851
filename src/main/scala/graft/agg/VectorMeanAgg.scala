package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of an `array<double>` column — ONE aggregate whose
  * buffer is a flat `[count, sum_0, …, sum_{dim−1}]` array, replacing the
  * `dim × avg(v[i])` expansion that bloats the plan and re-walks the array
  * per dimension at realistic embedding dims (768–1536). One pass per row,
  * flat plan at any dim; partial buffers merge as k·(dim+1) doubles through
  * the shuffle. Null vectors are skipped; dim is fixed by the first vector
  * seen and a mismatch fails loudly. Empty group → null. */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def prettyName: String = "vector_mean"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // buffer layout: [n, sum_0, …, sum_{dim−1}]; empty = zero-length
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    val b = if (buf.isEmpty) new Array[Double](arr.length + 1) else buf
    require(b.length == arr.length + 1,
      s"vector_mean: dim ${arr.length} != established dim ${b.length - 1}")
    b(0) += 1.0
    var i = 0
    while (i < arr.length) { b(i + 1) += arr(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vector_mean: merging buffers of dim ${a.length - 1} and ${b.length - 1}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val n = buf(0)
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / n; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeDouble(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorMeanAgg =
    copy(child = c)
}

object VectorMeanAgg {
  /** Column-level API: element-wise mean of an `array<double>` column. */
  def column(v: Column): Column =
    ExpressionUtils.column(
      VectorMeanAgg(ExpressionUtils.expression(v)).toAggregateExpression())
}

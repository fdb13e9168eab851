package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Two-sample Kolmogorov–Smirnov statistic of a group's values against a
  * DRIVER-HELD baseline distribution — the stateful kernel behind
  * [[graft.ext.Eval.ksDriftWindowed]]'s streaming drift monitor (the
  * [[VectorMeanAgg]] pattern: one aggregate whose buffer Structured
  * Streaming can carry per window).
  *
  * Buffer = the group's per-distinct-value counts — bounded by score
  * GRANULARITY, not event rate, and HARD-CAPPED at `cap` (the
  * [[graft.util.GridGuard]] ceiling carried into streaming state: an
  * unrounded score column fails loudly at the first over-cap update
  * instead of growing per-window state without bound). The baseline is a
  * sorted (value, cumulative count) table baked into the expression —
  * granularity-bounded, so it ships to executors once per task like any
  * broadcast literal.
  *
  * eval walks the merged jump points of both step ECDFs with the same
  * integer-exact gap arithmetic as [[graft.ext.Eval.ksTest]]
  * (max |cna·n_b − cnb·n_a|, doubles only in the final two ratios), so the
  * per-window result is bit-identical to `ksTest(baseline, windowSlice)` —
  * suite-pinned. Null inputs are skipped; an all-null group returns a null
  * struct. Output: (n_live, d, d_crit, drifted). */
case class KsDriftAgg(
    child: Expression,
    baseVals: Array[Double],
    baseCum: Array[Long],
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with UnaryLike[Expression] {

  require(baseVals.length == baseCum.length && baseVals.nonEmpty,
    "ks_drift: empty or misaligned baseline")

  override def prettyName: String = "ks_drift"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_live", LongType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("d_crit", DoubleType, nullable = false),
    StructField("drifted", IntegerType, nullable = false)))

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  private def guard(m: mutable.HashMap[Double, Long]): Unit =
    require(m.size <= cap,
      s"ks_drift: over $cap distinct live values — feed ROUNDED scores " +
        "(the graft.grid.maxDistinct discipline); unbounded granularity " +
        "means unbounded per-window state")

  override def update(buf: mutable.HashMap[Double, Long],
      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      buf.update(d, buf.getOrElse(d, 0L) + 1L)
      guard(buf)
    }
    buf
  }

  override def merge(a: mutable.HashMap[Double, Long],
      b: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    guard(a)
    a
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    val nA = baseCum(baseCum.length - 1)
    val liveVals = buf.keysIterator.toArray
    java.util.Arrays.sort(liveVals)
    var nB = 0L
    buf.valuesIterator.foreach(nB += _)
    // two-pointer walk over the union of jump points; at each, the gap
    // numerator |cna·n_b − cnb·n_a| is exact integer arithmetic (the
    // ksTest shape — overflow posture as there: int64-safe to ~3·10⁹
    // rows per side)
    var i = 0; var j = 0; var cnb = 0L; var dnum = 0L
    while (i < baseVals.length || j < liveVals.length) {
      val takeBase = j >= liveVals.length ||
        (i < baseVals.length && baseVals(i) <= liveVals(j))
      val takeLive = i >= baseVals.length ||
        (j < liveVals.length && liveVals(j) <= baseVals(i))
      if (takeBase) i += 1
      if (takeLive) { cnb += buf(liveVals(j)); j += 1 }
      val cna = if (i == 0) 0L else baseCum(i - 1)
      val gap = math.abs(cna * nB - cnb * nA)
      if (gap > dnum) dnum = gap
    }
    val nProd = nA.toDouble * nB.toDouble
    val d = dnum.toDouble / nProd
    val dCrit = 1.358 * math.sqrt((nA + nB).toDouble / nProd)
    InternalRow(nB, d, dCrit, if (d > dCrit) 1 else 0)
  }

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) => out.writeDouble(v); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) { buf.update(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KsDriftAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KsDriftAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KsDriftAgg =
    copy(child = c)
}

object KsDriftAgg {
  /** Column-level API: KS-vs-baseline struct of a double column. */
  def column(v: Column, baseVals: Array[Double], baseCum: Array[Long],
      cap: Long): Column =
    ExpressionUtils.column(
      KsDriftAgg(ExpressionUtils.expression(v), baseVals, baseCum, cap)
        .toAggregateExpression())
}

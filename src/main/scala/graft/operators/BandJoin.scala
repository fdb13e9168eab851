package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Range join against a small band table (the grade-shell / binning shape:
  * every fact row lands in the band whose `[lo, hi)` interval contains its
  * value).
  *
  * Spark plans a `fact JOIN bands ON v >= lo AND v < hi` as a
  * BroadcastNestedLoopJoin — O(bands) comparisons per row and a join node
  * in the plan. For the overwhelmingly common case (bands sorted,
  * non-overlapping, known up front) the join disappears entirely: the
  * band table rides a codegen expression as a sorted array and each row
  * pays one binary search, staying inside whole-stage codegen. Rows
  * outside every band get null (≡ the range join's non-match).
  */
final class BandKernel(val los: Array[Double], val his: Array[Double],
    val names: Array[UTF8String]) extends Serializable {
  /** Index of the band containing v, −1 when none. Bands are sorted by lo
    * and non-overlapping, so the candidate is the last band with lo ≤ v. */
  def find(v: Double): Int = {
    var lo = 0; var hi = los.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= v) lo = mid + 1 else hi = mid
    }
    val c = lo - 1
    if (c >= 0 && v < his(c)) c else -1
  }
}

case class BandLookup(child: Expression, kernel: BandKernel)
  extends UnaryExpression {

  override def prettyName: String = "band_lookup"
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val i = kernel.find(v.asInstanceOf[Double])
    if (i < 0) null else kernel.names(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandKernel", kernel, classOf[BandKernel].getName)
    val idx = ctx.freshName("graftBand")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         int $idx = $ref.find($v);
         if ($idx < 0) { ${ev.isNull} = true; }
         else { ${ev.value} = $ref.names()[$idx]; }
       """)
  }

  override protected def withNewChildInternal(c: Expression): BandLookup =
    copy(child = c)
}

object BandJoin {

  /** Band column for sorted non-overlapping `[lo, hi)` bands — the
    * join-free fast path. */
  def bandOf(value: Column, bands: Seq[(String, Double, Double)]): Column = {
    val sorted = bands.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, _, h1), (_, l2, _)) =>
        require(h1 <= l2, s"bands overlap: hi=$h1 > lo=$l2")
      case _ =>
    }
    val kernel = new BandKernel(sorted.map(_._2).toArray,
      sorted.map(_._3).toArray,
      sorted.map(b => UTF8String.fromString(b._1)).toArray)
    ExpressionUtils.column(BandLookup(
      ExpressionUtils.expression(value.cast("double")), kernel))
  }

  /** General range join for a DataFrame band table (possibly overlapping
    * bands → one output row per matching band): broadcast the small side,
    * `theta` condition `v >= lo AND v < hi`. Inner semantics — non-matching
    * fact rows drop, like SQL. */
  def joinByRange(fact: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String): DataFrame =
    fact.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}

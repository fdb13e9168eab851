package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary over a string column: a bounded
  * `capacity`-counter sketch whose retained set is GUARANTEED to contain
  * every value with true frequency > n/(capacity+1) (n = stream length).
  * That guarantee is what makes exact heavy hitters tractable at corpus
  * scale: a full `groupBy(token)` shuffles the VOCABULARY (hundreds of
  * millions of keys on web text); this sketch reduces the first pass to a
  * per-partition bounded map + one tiny merge, after which an exact
  * recount only has to visit the ≤ `capacity` candidates (see
  * [[graft.ext.TextAnalysis.heavyHitters]] — the composition returns
  * exact counts, the sketch only bounds WHERE they can hide).
  *
  * Mechanics (Misra–Gries 1982): a miss on a full summary decrements every
  * counter and evicts zeros — each such event destroys `capacity+1` units
  * of count mass that arrived exactly once, hence the n/(capacity+1)
  * under-count bound. The decrement sweep is O(capacity) but amortized
  * O(1) per row (a sweep only fires after ≥ capacity distinct inserts
  * paid for it). Merge (Agarwal et al. 2013, "Mergeable Summaries"): add
  * counters, then subtract the (capacity+1)-th largest count and evict
  * non-positives — the merged sketch obeys the same bound over the
  * combined stream, so partial aggregation is safe at any tree depth. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < capacity =>
          buf.update(key.clone(), 1L) // detach from the unsafe-row buffer
        case None =>
          // decrement-all sweep; evict exhausted counters
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, evict non-positives
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.foreach { case (k, c) =>
        if (c <= cut) dead += k else a.update(k, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Retained candidate values, sorted by estimated count descending then
    * value ascending (deterministic transport order; estimates themselves
    * are NOT returned — callers recount exactly). */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Long)] {
      def compare(x: (UTF8String, Long), y: (UTF8String, Long)): Int = {
        val byCount = java.lang.Long.compare(y._2, x._2)
        if (byCount != 0) byCount else x._1.compareTo(y._1)
      }
    })
    new GenericArrayData(arr.map(_._1.asInstanceOf[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** `misra_gries($"tok", capacity)` → `array<string>` of candidates. */
  def apply(value: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(value), capacity)
        .toAggregateExpression())
}

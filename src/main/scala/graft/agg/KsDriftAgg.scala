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

/** Shared stateful kernel of the WINDOWED drift monitors
  * ([[graft.ext.Eval.ksDriftWindowed]],
  * [[graft.ext.Eval.rankSumDriftWindowed]]) — the [[VectorMeanAgg]]
  * pattern: one aggregate whose buffer Structured Streaming can carry per
  * window.
  *
  * Buffer = the group's per-distinct-value counts — bounded by score
  * GRANULARITY, not event rate, and HARD-CAPPED at `cap` (the
  * [[graft.util.GridGuard]] ceiling carried into streaming state: an
  * unrounded score column fails loudly at the first over-cap update
  * instead of growing per-window state without bound). The baseline is a
  * driver-held table baked into the expression — granularity-bounded, so
  * it ships to executors like any broadcast literal. Null inputs are
  * skipped; an all-null group returns a null struct. */
abstract class ValueCountsDriftAgg
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with UnaryLike[Expression] {

  def cap: Long
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  private def guard(m: mutable.HashMap[Double, Long]): Unit =
    require(m.size <= cap,
      s"$prettyName: over $cap distinct live values — feed ROUNDED " +
        "scores (the graft.grid.maxDistinct discipline); unbounded " +
        "granularity means unbounded per-window state")

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
}

/** Two-sample Kolmogorov–Smirnov statistic of a group's values against a
  * DRIVER-HELD baseline distribution (sorted values + CUMULATIVE counts).
  *
  * eval walks the merged jump points of both step ECDFs with the same
  * integer-exact gap arithmetic as [[graft.ext.Eval.ksTest]]
  * (max |cna·n_b − cnb·n_a|, doubles only in the final two ratios), so the
  * per-window result is bit-identical to `ksTest(baseline, windowSlice)` —
  * suite-pinned. Output: (n_live, d, d_crit, drifted). */
case class KsDriftAgg(
    child: Expression,
    baseVals: Array[Double],
    baseCum: Array[Long],
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ValueCountsDriftAgg {

  require(baseVals.length == baseCum.length && baseVals.nonEmpty,
    "ks_drift: empty or misaligned baseline")

  override def prettyName: String = "ks_drift"
  override def dataType: DataType = StructType(Seq(
    StructField("n_live", LongType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("d_crit", DoubleType, nullable = false),
    StructField("drifted", IntegerType, nullable = false)))

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

  override def withNewMutableAggBufferOffset(o: Int): KsDriftAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KsDriftAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KsDriftAgg =
    copy(child = c)
}

object KsDriftAgg {
  /** Column-level API: KS-vs-baseline struct of a numeric column. The
    * child is cast to double HERE (ADVICE r12): update() reads the
    * evaluated value as Double, so a float/decimal/int column passed
    * directly would otherwise fail with an opaque ClassCastException at
    * execution time instead of casting at analysis time. */
  def column(v: Column, baseVals: Array[Double], baseCum: Array[Long],
      cap: Long): Column =
    ExpressionUtils.column(
      KsDriftAgg(ExpressionUtils.expression(v.cast("double")),
        baseVals, baseCum, cap).toAggregateExpression())
}

/** Mann–Whitney rank-sum statistic of a group's values against a
  * DRIVER-HELD baseline distribution (sorted values + CUMULATIVE counts —
  * the same [[graft.ext.Eval.ksBaseline]] artifact the KS twin takes, so
  * one snapshot pass serves both monitors).
  *
  * eval walks the merged per-value counts in sorted order accumulating
  * the live side's mid-rank sum and the tie term with the exact same
  * arithmetic shapes as [[graft.ext.Eval.rankSumTest]] (rank sums are
  * exact 0.5-multiples, the tie term an exact integer sum, z one fixed
  * expression) — per-window result bit-identical to
  * `rankSumTest(baseline, windowSlice)`, suite-pinned.
  * Output: (n_live, u, z, drifted); z NULL when all values tie. */
case class RankSumDriftAgg(
    child: Expression,
    baseVals: Array[Double],
    baseCum: Array[Long],
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ValueCountsDriftAgg {

  require(baseVals.length == baseCum.length && baseVals.nonEmpty,
    "rank_sum_drift: empty or misaligned baseline")

  override def prettyName: String = "rank_sum_drift"
  override def dataType: DataType = StructType(Seq(
    StructField("n_live", LongType, nullable = false),
    StructField("u", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = true),
    StructField("drifted", IntegerType, nullable = false)))

  override def eval(buf: mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    val nA = baseCum(baseCum.length - 1)
    val liveVals = buf.keysIterator.toArray
    java.util.Arrays.sort(liveVals)
    var nB = 0L
    buf.valuesIterator.foreach(nB += _)
    // tie term in DOUBLES (ADVICE r12, mirroring Eval.rankSumTest): t³
    // in int64 silently wraps past ~2·10⁶ rows tied on one value; the
    // double form is exact below 2⁵³ and degrades to rounding, not wrap
    var i = 0; var j = 0; var cum = 0L; var rb = 0.0; var ties = 0.0
    while (i < baseVals.length || j < liveVals.length) {
      val takeBase = j >= liveVals.length ||
        (i < baseVals.length && baseVals(i) <= liveVals(j))
      val takeLive = i >= baseVals.length ||
        (j < liveVals.length && liveVals(j) <= baseVals(i))
      var nv = 0L; var cb = 0L
      if (takeBase) {
        nv += baseCum(i) - (if (i == 0) 0L else baseCum(i - 1)); i += 1
      }
      if (takeLive) { cb = buf(liveVals(j)); nv += cb; j += 1 }
      // batch shape: avgrank = (cum_through_v − nv) + (nv + 1)/2, an
      // exact 0.5-multiple; rb accumulates exact halves (order-free)
      val avgrank = cum.toDouble + (nv + 1L).toDouble / 2.0
      rb += cb.toDouble * avgrank
      ties += nv.toDouble * nv * nv - nv
      cum += nv
    }
    val (na, nb) = (nA.toDouble, nB.toDouble)
    val n = na + nb
    val u = rb - nb * (nb + 1.0) / 2.0
    val sigma2 = na * nb / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    if (sigma2 > 0) {
      val z = (u - na * nb / 2.0) / math.sqrt(sigma2)
      InternalRow(nB, u, z, if (math.abs(z) > 1.96) 1 else 0)
    } else InternalRow(nB, u, null, 0)
  }

  override def withNewMutableAggBufferOffset(o: Int): RankSumDriftAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankSumDriftAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): RankSumDriftAgg =
    copy(child = c)
}

object RankSumDriftAgg {
  /** Column-level API: rank-sum-vs-baseline struct of a numeric column
    * (child cast to double here — the KsDriftAgg.column note). */
  def column(v: Column, baseVals: Array[Double], baseCum: Array[Long],
      cap: Long): Column =
    ExpressionUtils.column(
      RankSumDriftAgg(ExpressionUtils.expression(v.cast("double")),
        baseVals, baseCum, cap).toAggregateExpression())
}

/** Pearson chi-squared statistic of a group's CATEGORY mix against a
  * DRIVER-HELD baseline count table — [[graft.ext.Outliers
  * .chiSquareDriftWindowed]]'s kernel. Buffer = per-category counts,
  * capped like the numeric twins (a free-text column is not a category).
  * eval sums the per-category terms in SORTED category order (a
  * deterministic driver-side order; the batch aggregate's partition
  * order differs, so batch ≡ windowed holds to float summation order —
  * both sides round at 6 dp, suite-pinned at that grain) with the exact
  * same expression shapes as [[graft.ext.Outliers.chiSquareDrift]].
  * Output: (n_live, k, chi2, chi2_crit, drifted); k counts categories
  * seen in either side, statistic NULL at k = 1. */
case class ChiSquareDriftAgg(
    child: Expression,
    baseCounts: Map[String, Long],
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(baseCounts.nonEmpty, "chi2_drift: empty baseline")

  override def prettyName: String = "chi2_drift"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_live", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("chi2", DoubleType, nullable = true),
    StructField("chi2_crit", DoubleType, nullable = true),
    StructField("drifted", IntegerType, nullable = false)))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def guard(m: mutable.HashMap[String, Long]): Unit =
    require(m.size <= cap,
      s"chi2_drift: over $cap distinct live categories — a free-text " +
        "column is not a category (the graft.grid.maxDistinct discipline)")

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val c = v.toString
      buf.update(c, buf.getOrElse(c, 0L) + 1L)
      guard(buf)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    guard(a)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    if (buf.isEmpty) return null
    val cats = (baseCounts.keySet ++ buf.keySet).toArray.sorted
    val nB = baseCounts.valuesIterator.sum.toDouble
    var nL0 = 0L
    buf.valuesIterator.foreach(nL0 += _)
    val nL = nL0.toDouble
    val nT = nB + nL
    val k = cats.length.toLong
    if (k <= 1) return InternalRow(nL0, k, null, null, 0)
    var chi2 = 0.0
    cats.foreach { c =>
      val ob = baseCounts.getOrElse(c, 0L).toDouble
      val ol = buf.getOrElse(c, 0L).toDouble
      val cat = (baseCounts.getOrElse(c, 0L) + buf.getOrElse(c, 0L)).toDouble
      val eb = nB * cat / nT
      val el = nL * cat / nT
      chi2 += (ob - eb) * (ob - eb) / eb + (ol - el) * (ol - el) / el
    }
    val dof = (k - 1L).toDouble
    val wh = dof * math.pow(1.0 - 2.0 / (9.0 * dof) +
      1.6449 * math.sqrt(2.0 / (9.0 * dof)), 3)
    // the batch op's 6 dp rounding (Spark round = HALF_UP via BigDecimal)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (c6, w6) = (r6(chi2), r6(wh))
    InternalRow(nL0, k, c6, w6, if (c6 > w6) 1 else 0)
  }

  // length-prefixed UTF-8, NOT writeUTF (ADVICE r12): writeUTF throws
  // UTFDataFormatException past 65,535 bytes, and the GridGuard cap
  // bounds distinct COUNT, not string length — a long free-text value
  // accepted by update() must not kill the task at state serialization
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ChiSquareDriftAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ChiSquareDriftAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ChiSquareDriftAgg =
    copy(child = c)
}

object ChiSquareDriftAgg {
  /** Column-level API: chi2-vs-baseline struct of a category column
    * (child cast to string here — the KsDriftAgg.column note; update()
    * stringifies values, so the cast makes the contract explicit at
    * analysis time). */
  def column(v: Column, baseCounts: Map[String, Long], cap: Long): Column =
    ExpressionUtils.column(
      ChiSquareDriftAgg(ExpressionUtils.expression(v.cast("string")),
        baseCounts, cap).toAggregateExpression())
}

/** Stateful kernel of [[graft.ext.TextAnalysis.vocabDivergenceWindowed]]
  * — the text member's serving twin. The token space is the cap risk
  * (unlike a category column, a vocabulary grows with the corpus), so
  * the state is NOT the raw token counts: `update` PROJECTS each token
  * onto the driver-held serving vocabulary — the baseline's top-K
  * tokens, everything else folded into one out-of-vocabulary cell — and
  * the buffer is hard-bounded at K+1 counters per group by
  * construction, no guard needed. `eval` replays
  * [[graft.ext.TextAnalysis.vocabDivergence]]'s alpha-smoothed KL/JS
  * arithmetic over the FIXED K+1 categories (vocab = K+1 in the
  * smoothing denominators — the projected statistic, not the full-vocab
  * batch one; the serving monitor trades the unbounded tail for bounded
  * state, exactly the Misra–Gries posture). Null tokens are skipped; an
  * all-null group returns a null struct. */
case class VocabDriftAgg(
    child: Expression,
    baseCounts: Map[String, Long],
    baseTotal: Long,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(baseCounts.nonEmpty, "vocab_drift: empty baseline vocabulary")
  require(baseTotal >= baseCounts.valuesIterator.sum,
    "vocab_drift: baseTotal smaller than the top-K mass it must contain")

  /** The OOV cell's key — a single space cannot be produced by the word
    * tokenizer ([a-z0-9]+), so it never collides with a real token. */
  private val Oov = " "

  override def prettyName: String = "vocab_drift"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_live", LongType, nullable = false),
    StructField("kl_ab", DoubleType, nullable = false),
    StructField("kl_ba", DoubleType, nullable = false),
    StructField("js", DoubleType, nullable = false)))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], tok0: String): Unit = {
    val tok = if (baseCounts.contains(tok0)) tok0 else Oov
    buf.update(tok, buf.getOrElse(tok, 0L) + 1L)
  }

  // accepts a single token (the exploded form) OR a whole token array
  // (the fused-gate form, where the row grain must stay one-per-document
  // so the sibling aggregates in the same grouping see each doc once)
  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    child.eval(input) match {
      case null => ()
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        var i = 0
        while (i < a.numElements()) {
          if (!a.isNullAt(i)) add(buf, a.getUTF8String(i).toString)
          i += 1
        }
      case v => add(buf, v.toString)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    if (buf.isEmpty) return null
    var nL = 0L
    buf.valuesIterator.foreach(nL += _)
    // fixed category order: sorted top-K tokens, then the OOV cell —
    // deterministic term order so the 6 dp-rounded sums are replayable
    val cats = baseCounts.keysIterator.toArray.sorted :+ Oov
    val vocab = cats.length.toDouble
    val oovBase = baseTotal - baseCounts.valuesIterator.sum
    val denA = baseTotal.toDouble + alpha * vocab
    val denB = nL.toDouble + alpha * vocab
    var klAb = 0.0; var klBa = 0.0; var js = 0.0
    cats.foreach { c =>
      val cb = if (c == Oov) oovBase else baseCounts(c)
      val cl = buf.getOrElse(c, 0L)
      val pa = (cb.toDouble + alpha) / denA
      val pb = (cl.toDouble + alpha) / denB
      klAb += pa * math.log(pa / pb)
      klBa += pb * math.log(pb / pa)
      js += pa * math.log(pa * 2.0 / (pa + pb)) / 2.0 +
        pb * math.log(pb * 2.0 / (pa + pb)) / 2.0
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    InternalRow(nL, r6(klAb), r6(klBa), r6(js))
  }

  // the ChiSquareDriftAgg length-prefixed form: tokens are free text
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VocabDriftAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VocabDriftAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VocabDriftAgg =
    copy(child = c)
}

object VocabDriftAgg {
  /** Column-level API: alpha-smoothed KL/JS-vs-baseline struct of a
    * token column projected onto the baseline's top-K vocabulary (+1
    * OOV cell). */
  def column(tok: Column, baseCounts: Map[String, Long], baseTotal: Long,
      alpha: Double): Column =
    ExpressionUtils.column(
      VocabDriftAgg(ExpressionUtils.expression(tok.cast("string")),
        baseCounts, baseTotal, alpha).toAggregateExpression())

  /** The token-ARRAY form for fused gates: one update per document row
    * (the row grain the sibling aggregates need), iterating the array
    * inside the buffer update — no explode, identical statistic. */
  def columnTokens(toks: Column, baseCounts: Map[String, Long],
      baseTotal: Long, alpha: Double): Column =
    ExpressionUtils.column(
      VocabDriftAgg(ExpressionUtils.expression(toks.cast("array<string>")),
        baseCounts, baseTotal, alpha).toAggregateExpression())
}

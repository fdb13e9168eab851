package graft.functions

import java.security.MessageDigest
import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the dedup shingle pipeline.
  *
  * The SQL-composed equivalent — `regexp_extract_all` + nested
  * `transform`/`concat_ws`/`md5`/`conv` lambdas — runs per ELEMENT through
  * interpreted higher-order-function eval (Spark's lambda functions are not
  * code-generated), costing ~10 µs per shingle. This kernel does tokenize →
  * shingle → hash → distinct → sort in one scan per document and is invoked
  * as a single static call from within whole-stage codegen.
  *
  * Semantics are bit-identical to the SQL chain (and to the DuckDB oracle):
  *   - tokens: maximal `[a-z0-9]+` runs of `lower(text)`;
  *   - shingles: space-joined word n-grams; texts with < n tokens yield one
  *     whole-text shingle (all tokens space-joined — "" for empty text);
  *   - hash: first 15 hex digits of md5(shingle) as a base-16 number —
  *     computed here as the big-endian first 8 digest bytes >>> 4;
  *   - distinct + ascending sort.
  */
object ShingleKernel {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s): == CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT). */
  def hash60(s: String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def tokens(text: String): mutable.ArrayBuffer[String] = {
    val s = text.toLowerCase(Locale.ROOT)
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += s.substring(start, i)
      } else i += 1
    }
    out
  }

  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text.toString)
    val hashes =
      if (toks.length < n) Array(hash60(toks.mkString(" ")))
      else {
        val set = new java.util.HashSet[java.lang.Long](toks.length * 2)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        val m = toks.length - n + 1
        val arr = mutable.ArrayBuffer.empty[Long]
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val h = hash60(sb.toString)
          if (set.add(h)) arr += h
          i += 1
        }
        arr.toArray
      }
    java.util.Arrays.sort(hashes)
    new GenericArrayData(hashes)
  }
}

/** `hashed_shingles(text, n)`: sorted distinct 60-bit hashes of word
  * n-gram shingles (see [[ShingleKernel]]). */
case class HashedShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def prettyName: String = "hashed_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    ShingleKernel.hashedShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleKernel.hashedShingles($t, $n);")

  override protected def withNewChildInternal(c: Expression): HashedShingles =
    copy(child = c)
}

object HashedShingles {
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(HashedShingles(ExpressionUtils.expression(text), n))
}

/** Kernel for [[MinMd5Ngram]]: one MessageDigest reused across positions,
  * min kept as the raw 16-byte digest (unsigned byte-wise order ≡
  * lexicographic order of the lowercase-hex rendering, because the hex
  * alphabet 0-9a-f is ascending in ASCII), hex-encoded once at the end. */
object FingerprintKernel {
  private val HexChars = "0123456789abcdef".toCharArray

  def minMd5Ngram(s: UTF8String, n: Int): UTF8String = {
    // one byte-array pass builds char-start offsets, then every n-gram
    // digests straight out of the shared byte buffer: no per-position
    // substring, no per-position digest allocation (digest into a
    // reusable 16-byte buffer via the DigestException overload)
    val bytes = s.getBytes
    val len = bytes.length
    val offs = new Array[Int](len + 1) // chars <= bytes, malformed-input safe
    var i = 0
    var chars = 0
    while (i < len) {
      offs(chars) = i
      chars += 1
      val b = bytes(i) & 0xFF
      i += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
    }
    offs(chars) = len
    val positions = math.max(chars - (n - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    val cand = new Array[Byte](16)
    val best = new Array[Byte](16)
    var have = false
    var p = 0
    while (p < positions) {
      val from = offs(p)
      val until = offs(math.min(p + n, chars))
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(cand, 0, 16)
      if (!have || java.util.Arrays.compareUnsigned(cand, best) < 0) {
        System.arraycopy(cand, 0, best, 0, 16)
        have = true
      }
      p += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = HexChars((best(j) >> 4) & 0xF)
      out(j * 2 + 1) = HexChars(best(j) & 0xF)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** `min_md5_ngram(text, n)`: minimum md5 hex digest over all character
  * n-grams — the winnowing-style document fingerprint, natively.
  *
  * Bit-identical to the SQL chain
  * `array_min(transform(sequence(1, greatest(length(t)-(n-1), 1)),
  * i => md5(substr(t, i, n))))` (pinned by Round8OpsSuite), but ~10×
  * cheaper: the composed form materializes a position array, a substring
  * string, an md5 call AND a 32-char hex string per position through
  * interpreted higher-order-function eval; the kernel runs one digest
  * instance down the document and hex-encodes exactly once. Texts shorter
  * than n (empty included) hash their whole content, matching
  * `substr`'s clamping. */
case class MinMd5Ngram(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def prettyName: String = "min_md5_ngram"
  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(t: Any): Any =
    FingerprintKernel.minMd5Ngram(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.FingerprintKernel.minMd5Ngram($t, $n);")

  override protected def withNewChildInternal(c: Expression): MinMd5Ngram =
    copy(child = c)
}

object MinMd5Ngram {
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(MinMd5Ngram(ExpressionUtils.expression(text), n))
}

/** Kernel for [[TokenNgramHashes]]. Tokenization replicates
  * `split(trim(text), "\\s+")` EXACTLY — UTF8String.trim (spaces only,
  * like SQL trim, NOT Java's control-char trim) then the same Java regex
  * with limit −1 (trailing empties kept) — so positions match the
  * composed form byte-for-byte; the hash is the same XXH64/seed-42 that
  * `xxhash64(string)` computes. */
object NgramHashKernel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def positionalHashes(s: UTF8String, k: Int): ArrayData = {
    val trimmed = s.trim.toString
    if (trimmed.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = Ws.split(trimmed, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = java.lang.Long.valueOf(
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(sb.toString), 42L))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `token_ngram_hashes(text, k)`: xxhash64 of every POSITIONAL k-gram of
  * whitespace tokens, in document order (length max(0, ntok−k+1); shorter
  * texts yield an empty array). Bit-identical to
  * `transform(sequence(0, size(toks)-k), i => xxhash64(concat_ws(' ',
  * slice(toks, i+1, k))))` over `toks = split(trim(text), '\\s+')`
  * (pinned by Round8OpsSuite) — but the composed form evaluates an
  * interpreted lambda, an array slice, a concat AND a fresh string per
  * position; the kernel tokenizes once and reuses one builder. This is
  * the hot inner map of the duplicated-span detector
  * ([[graft.ext.Dedup.duplicatedSpans]]), which runs it over every token
  * position of the corpus. */
case class TokenNgramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "token_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    NgramHashKernel.positionalHashes(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NgramHashKernel.positionalHashes($t, $k);")

  override protected def withNewChildInternal(c: Expression): TokenNgramHashes =
    copy(child = c)
}

object TokenNgramHashes {
  def column(text: Column, k: Int): Column =
    ExpressionUtils.column(TokenNgramHashes(ExpressionUtils.expression(text), k))
}

/** `dsir_slots(text, buckets)`: the DSIR hashed feature stream — every
  * word token AND every adjacent bigram, each mapped to
  * `hash60(feature) mod buckets` — as one positional int array
  * (duplicates preserved; the slot COUNTS are the feature vector).
  * Bit-identical to exploding `wordTokens` ∪ adjacent-bigram concats
  * through `pmod(conv(substr(md5(f),1,15),16,10), buckets)` (pinned by
  * Round8OpsSuite) — but one scan, one digest instance, and no feature
  * STRINGS ever materialize in the plan. Documents with no tokens yield
  * an empty array (explode drops them, matching the composed form). */
case class DsirSlots(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def prettyName: String = "dsir_slots"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    DsirSlotKernel.slots(t.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DsirSlotKernel.slots($t, $buckets);")

  override protected def withNewChildInternal(c: Expression): DsirSlots =
    copy(child = c)
}

object DsirSlotKernel {
  def slots(text: UTF8String, buckets: Int): ArrayData = {
    val toks = ShingleKernel.tokens(text.toString)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n + math.max(n - 1, 0))
    var i = 0
    while (i < n) {
      out(i) = (ShingleKernel.hash60(toks(i)) % buckets).toInt
      i += 1
    }
    val sb = new java.lang.StringBuilder(48)
    var g = 1
    while (g < n) {
      sb.setLength(0)
      sb.append(toks(g - 1)).append(' ').append(toks(g))
      out(n + g - 1) = (ShingleKernel.hash60(sb.toString) % buckets).toInt
      g += 1
    }
    new GenericArrayData(out)
  }
}

object DsirSlots {
  def column(text: Column, buckets: Int): Column =
    ExpressionUtils.column(DsirSlots(ExpressionUtils.expression(text), buckets))
}

/** `bigram_hashes(text)`: per adjacent word-token bigram, the struct
  * (w1h = xxhash64(w1), bh = xxhash64(w1, w2)) in document order — the
  * hash-only bigram stream of the corpus LM
  * ([[graft.ext.TextAnalysis.lmScore]]). Bit-identical to exploding
  * `struct(w1, w2)` and hashing per row (xxhash64's multi-argument
  * chaining: bh seeds w2's hash with w1's — pinned by Round8OpsSuite),
  * minus the per-position lambda, struct-of-strings, and two expression
  * evals. Texts with < 2 tokens yield an empty array. */
case class BigramHashes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_hashes"
  override def dataType: DataType = BigramHashes.Schema

  override def nullSafeEval(t: Any): Any =
    BigramHashKernel.bigrams(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BigramHashKernel.bigrams($t);")

  override protected def withNewChildInternal(c: Expression): BigramHashes =
    copy(child = c)
}

object BigramHashKernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def bigrams(text: UTF8String): ArrayData = {
    val toks = ShingleKernel.tokens(text.toString)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = UTF8String.fromString(toks(0))
    var g = 1
    while (g < n) {
      val cur = UTF8String.fromString(toks(g))
      val w1h = XXH64.hashUTF8String(prev, 42L)
      val bh = XXH64.hashUTF8String(cur, w1h)
      out(g - 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](w1h, bh))
      prev = cur
      g += 1
    }
    new GenericArrayData(out)
  }
}

object BigramHashes {
  import org.apache.spark.sql.types.{LongType => SLong, StructField, StructType}
  val Schema: DataType = ArrayType(
    StructType(Seq(StructField("w1h", SLong, nullable = false),
      StructField("bh", SLong, nullable = false))), containsNull = false)

  def column(text: Column): Column =
    ExpressionUtils.column(BigramHashes(ExpressionUtils.expression(text)))
}

/** 60-bit SimHash sketch computed natively: tokenize (same scanner as
  * [[ShingleKernel.tokens]]), distinct tokens, one md5-derived 60-bit hash
  * per token, ±1 per-bit vote, sign fold. Bit-identical to the SQL
  * `aggregate(zip_with(...))` chain in [[graft.ext.Dedup.simhash]]'s
  * documentation (hash bit b lands at sketch position 59−b), which paid
  * one interpreted md5 re-evaluation PER BIT per token. */
object SimHashKernel {
  def sketch(text: UTF8String): Long = {
    val toks = ShingleKernel.tokens(text.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val counts = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = ShingleKernel.hash60(t)
        var b = 0
        while (b < 60) {
          counts(b) += (((h >>> b) & 1L) * 2 - 1).toInt
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { sig = sig * 2 + (if (counts(b) > 0) 1 else 0); b += 1 }
    sig
  }
}

case class SimHashSketch(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash_sketch"
  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    SimHashKernel.sketch(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SimHashKernel.sketch($t);")

  override protected def withNewChildInternal(c: Expression): SimHashSketch =
    copy(child = c)
}

object SimHashSketch {
  def column(text: Column): Column =
    ExpressionUtils.column(SimHashSketch(ExpressionUtils.expression(text)))
}

/** MinHash band keys computed natively from a hashed-shingle array.
  *
  * For each hash function i: `sig_i = min over h of ((a_i·(h mod p) + b_i)
  * mod p)`; band key b = comma-joined decimal `sig` values of its
  * `numHashes/bands` rows. One static call per document replaces
  * `numHashes` interpreted `array_min(transform(...))` lambda scans.
  */
object MinHashKernel {
  val Prime = 1000000007L

  def bandKeys(hv: ArrayData, a: Array[Long], b: Array[Long],
      bands: Int): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hv.numElements()
    var i = 0
    while (i < n) {
      val hm = hv.getLong(i) % Prime
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % Prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val r = k / bands
    val out = new Array[AnyRef](bands)
    val sb = new java.lang.StringBuilder(r * 11)
    var bi = 0
    while (bi < bands) {
      sb.setLength(0)
      var j = 0
      while (j < r) {
        if (j > 0) sb.append(',')
        sb.append(sig(bi * r + j))
        j += 1
      }
      out(bi) = UTF8String.fromString(sb.toString)
      bi += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_band_keys(hashedShingles)`: array of `bands` band-key strings. */
case class MinHashBandKeys(child: Expression, a: Seq[Long], b: Seq[Long],
    bands: Int)
  extends UnaryExpression {

  require(a.length == b.length && a.length % bands == 0)
  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def prettyName: String = "minhash_band_keys"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(hv: Any): Any =
    MinHashKernel.bandKeys(hv.asInstanceOf[ArrayData], aArr, bArr, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, hv =>
      s"${ev.value} = graft.functions.MinHashKernel.bandKeys($hv, $aRef, $bRef, $bands);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandKeys =
    copy(child = c)
}

object MinHashBandKeys {
  def column(hashedShingles: Column, params: Seq[(Long, Long)],
      bands: Int): Column =
    ExpressionUtils.column(MinHashBandKeys(
      ExpressionUtils.expression(hashedShingles),
      params.map(_._1), params.map(_._2), bands))
}

/** Membership scan for a driver-built sorted long set: does any element of
  * the child array appear in it? One binary search per element, the set
  * shipped once per executor as a codegen reference object — the kernel
  * behind [[graft.ext.Dedup.decontaminateBroadcast]]'s per-row filter
  * (no join, no shuffle, streaming-safe). */
object LongSetKernel {
  def overlaps(arr: ArrayData, sorted: Array[Long]): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }
}

/** `array_overlaps_set(array<long>)`: true iff any element is in the
  * fixed sorted set. The set rides the expression as a Seq (value
  * equality for Catalyst transforms) with a lazy primitive mirror —
  * `Array[Long].toSeq` yields `ArraySeq.ofLong`, primitive-backed, so no
  * boxing; equality walks the elements, which bounds how large a set
  * should ride a plan (the decontamination cap defaults to 5M). */
case class ArrayOverlapsSet(child: Expression, set: Seq[Long])
  extends UnaryExpression {

  @transient private lazy val sorted: Array[Long] = {
    val a = set.toArray; java.util.Arrays.sort(a); a
  }

  override def prettyName: String = "array_overlaps_set"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(arr: Any): Any =
    LongSetKernel.overlaps(arr.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("overlapSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.LongSetKernel.overlaps($arr, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): ArrayOverlapsSet =
    copy(child = c)
}

object ArrayOverlapsSet {
  def column(arr: Column, set: Array[Long]): Column =
    ExpressionUtils.column(ArrayOverlapsSet(
      ExpressionUtils.expression(arr), set.toSeq))
}

/** Weighted-vocabulary lookup-sum for a driver-built sorted (token,
  * weight) table: Σ weight(token) over the array WITH multiplicity,
  * unknown tokens contributing 0. One binary search per token, the
  * vocabulary shipped once per executor as codegen reference objects —
  * the kernel behind [[graft.ext.TextAnalysis.nbScoreWith]]'s per-row
  * classifier scoring (no join, no shuffle, streaming-safe). */
object TokenWeightKernel {
  def sum(arr: ArrayData, keys: Array[UTF8String], w: Array[Double]): Double = {
    var s = 0.0
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val m = (lo + hi) >>> 1
        val c = keys(m).compareTo(t)
        if (c == 0) { s += w(m); lo = hi + 1; hi = -2 } // found → exit
        else if (c < 0) lo = m + 1
        else hi = m - 1
      }
      i += 1
    }
    s
  }
}

/** `token_weight_sum(array<string>)`: Σ weight over the fixed sorted
  * vocabulary, 0 for unknown tokens. Vocab and weights ride the
  * expression as Seqs (value equality for Catalyst transforms) with lazy
  * array mirrors; the companion sorts the pairs once at construction. */
case class TokenWeightSum(child: Expression, vocab: Seq[String],
    weights: Seq[Double])
  extends UnaryExpression {

  @transient private lazy val keysArr: Array[UTF8String] =
    vocab.iterator.map(UTF8String.fromString).toArray
  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def prettyName: String = "token_weight_sum"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(arr: Any): Any =
    TokenWeightKernel.sum(arr.asInstanceOf[ArrayData], keysArr, wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("twsKeys", keysArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val wRef = ctx.addReferenceObj("twsWeights", wArr, "double[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TokenWeightKernel.sum($arr, $kRef, $wRef);")
  }

  override protected def withNewChildInternal(c: Expression): TokenWeightSum =
    copy(child = c)
}

object TokenWeightSum {
  /** `pairs` need not be sorted; UTF8String (binary) order is applied
    * here so the kernel's binary search sees a consistent key order. */
  def column(tokens: Column, pairs: Array[(String, Double)]): Column = {
    val sorted = pairs.sortBy(p => UTF8String.fromString(p._1))
    ExpressionUtils.column(TokenWeightSum(
      ExpressionUtils.expression(tokens),
      sorted.map(_._1).toSeq, sorted.map(_._2).toSeq))
  }
}

/** Kernel for [[DeflateRatio]]: one-shot zlib DEFLATE (level 6) of the
  * UTF-8 bytes, counting output without keeping it. A fresh Deflater per
  * call — Deflaters are not thread-safe and rows evaluate on 32 codegen
  * threads; `end()` releases the native zlib state eagerly instead of
  * waiting on finalization. Deterministic: zlib's DEFLATE output for a
  * fixed input/level/strategy is stable across JDK releases (the
  * algorithm is pinned by RFC 1951 greedy matching at each level). */
object CompressKernel {
  def deflateRatio(t: UTF8String): Double = {
    val bytes = t.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](4096)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length.toDouble
    } finally d.end()
  }
}

/** `deflate_ratio(text)`: zlib-compressed size over raw UTF-8 size — the
  * classic compressibility quality signal (Gopher/RefinedWeb family):
  * boilerplate and template spam compress far below natural prose, random
  * noise compresses above 1. Empty text reports 1.0 (incompressible by
  * convention). No SQL-expressible oracle exists (zlib is not a DuckDB
  * builtin) — the kernel is suite-pinned against known-entropy inputs
  * instead. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def prettyName: String = "deflate_ratio"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(t: Any): Any =
    CompressKernel.deflateRatio(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CompressKernel.deflateRatio($t);")

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
}

object DeflateRatio {
  def column(text: Column): Column =
    ExpressionUtils.column(DeflateRatio(ExpressionUtils.expression(text)))
}

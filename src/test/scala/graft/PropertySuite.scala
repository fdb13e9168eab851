package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{SparkTest, WeightedQuantile}
import graft.model.TriMesh
import graft.operators.RotatedRectFit

/** Property tests from the SURVEY §5 test plan: invariants over seeded
  * random inputs (deterministic — no scalatest/scalacheck bridge in the
  * offline cache, so sampling is a plain seeded loop). */
class PropertySuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  test("r9 eval invariants: spearman in [-1,1] and symmetric; rbo bounds; nmi in [0,1]") {
    val rnd = new Random(11)
    for (_ <- 1 to 10) {
      val n = 20 + rnd.nextInt(60)
      val rows = List.fill(n)((math.floor(rnd.nextDouble() * 20) / 20.0,
        math.floor(rnd.nextDouble() * 20) / 20.0))
      val df = rows.toDF("a", "b")
      val rho = graft.ext.Eval.spearman(df, "a", "b").head()
      if (!rho.isNullAt(1)) {
        val v = rho.getDouble(1)
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"rho $v")
        val sym = graft.ext.Eval.spearman(
          df.select(org.apache.spark.sql.functions.col("b").as("a"),
            org.apache.spark.sql.functions.col("a").as("b")), "a", "b")
          .head().getDouble(1)
        assert(math.abs(v - sym) < 1e-12, "spearman is symmetric")
      }
      val mi = graft.ext.Eval.mutualInfo(df, "a", "b", nBins = 4).head()
      assert(mi.getDouble(1) >= -1e-9, "MI is non-negative")
      if (!mi.isNullAt(4)) {
        val nmi = mi.getDouble(4)
        assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-6, s"nmi $nmi")
      }
    }
    for (seed <- 1 to 5) {
      val rnd2 = new Random(seed)
      val ids = (1L to 15L).toList
      def run() = rnd2.shuffle(ids).take(10).zipWithIndex
        .map { case (id, i) => (id, 100.0 - i) }.toDF("id", "score")
      val r = graft.ext.Similarity.rbo(run(), run(), "id").head()
      val (trunc, ext2) = (r.getDouble(2), r.getDouble(3))
      assert(trunc >= 0 && trunc <= 1.0 - math.pow(0.9, 10) + 1e-9,
        s"truncated rbo $trunc exceeds the prefix mass")
      assert(ext2 >= trunc - 1e-12 && ext2 <= 1.0 + 1e-9)
    }
  }

  test("r9 drift/CI invariants: psi windows non-negative-ish baseline zero; bootstrap lo<=mean-ish<=hi") {
    val rnd = new Random(23)
    for (_ <- 1 to 5) {
      val n = 50 + rnd.nextInt(100)
      val df = (1L to n).map(i => (i, rnd.nextDouble() * 10))
        .toDF("id", "x")
      val ci = graft.ext.Eval.bootstrapCI(df, "id", "x").head()
      assert(ci.getDouble(2) <= ci.getDouble(3) + 1e-12,
        "ci_lo must not exceed ci_hi")
      // the plain mean need not sit inside the empirical 95% band for
      // adversarial data, but for iid uniform it practically always does
      assert(ci.getDouble(2) <= ci.getDouble(1) + 0.5 &&
        ci.getDouble(1) <= ci.getDouble(3) + 0.5)
    }
  }

  test("weighted quantile with w≡1 equals the unweighted estimator") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val vals = List.fill(1 + rnd.nextInt(50))(rnd.nextDouble() * 2000 - 1000)
      val q = Seq(0.25, 0.5, 0.75)(rnd.nextInt(3))
      val df = vals.map(v => (v, 1.0)).toDF("v", "w")
      val weighted = df.agg(WeightedQuantile(
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("w"), q)).head().getDouble(0)
      // unit weights → p = q(n−1) over sorted values, linear interpolation
      // == numpy/pandas percentile
      val s = vals.sorted
      val p = q * (s.length - 1)
      val lo = p.toInt
      val frac = p - math.floor(p)
      val expected =
        if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac
        else s(lo)
      assert(math.abs(weighted - expected) < 1e-9 * math.max(1, math.abs(expected)),
        s"q=$q n=${s.length}")
    }
  }

  test("box containment is invariant under z-rotation of mesh and point") {
    val rnd = new Random(7)
    var checked = 0
    for (_ <- 1 to 60) {
      val x0 = -rnd.nextDouble() * 50; val dx = 1 + rnd.nextDouble() * 49
      val y0 = -rnd.nextDouble() * 50; val dy = 1 + rnd.nextDouble() * 49
      val z0 = -rnd.nextDouble() * 50; val dz = 1 + rnd.nextDouble() * 49
      val box = TriMesh.box("b", x0, x0 + dx, y0, y0 + dy, z0, z0 + dz)
      val px = rnd.nextDouble() * 120 - 60
      val py = rnd.nextDouble() * 120 - 60
      val pz = rnd.nextDouble() * 120 - 60
      val bearing = rnd.nextDouble() * 360
      val inside = box.containsPoint(px, py, pz)
      val rot = RotatedRectFit.rotateMesh(box, bearing, 5.0, 5.0)
      val a = math.toRadians(-(bearing - 90.0))
      val c = math.cos(a); val s = math.sin(a)
      val rx = 5.0 + c * (px - 5.0) - s * (py - 5.0)
      val ry = 5.0 + s * (px - 5.0) + c * (py - 5.0)
      val b = box.bounds
      val nearFace = Seq(px - b(0), b(1) - px, py - b(2), b(3) - py,
        pz - b(4), b(5) - pz).exists(d => math.abs(d) < 1e-6)
      if (!nearFace) {
        assert(rot.containsPoint(rx, ry, pz) == inside,
          s"box=(${b.mkString(",")}) p=($px,$py,$pz) bearing=$bearing")
        checked += 1
      }
    }
    assert(checked > 40)
  }

  test("SortedIntersectSize equals set intersection on random sorted arrays") {
    val rnd = new Random(13)
    for (_ <- 1 to 30) {
      val universe = (1 to 40).map(_ => rnd.nextLong() % 1000)
      val a = universe.filter(_ => rnd.nextBoolean()).distinct.sorted
      val b = universe.filter(_ => rnd.nextBoolean()).distinct.sorted
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(graft.functions.SetSimilarity.sortedIntersectSize(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).head().getInt(0)
      assert(got == a.toSet.intersect(b.toSet).size)
    }
  }

  test("shingle kernel tokenization equals the regex on random text") {
    val rnd = new Random(17)
    val alphabet = "abcXYZ012 .,;!-_\t\n"
    for (_ <- 1 to 50) {
      val text = List.fill(rnd.nextInt(200))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val viaKernel = graft.functions.ShingleKernel.tokens(text).toList
      val viaRegex = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toList
      assert(viaKernel == viaRegex, s"text=${text.take(60)}")
    }
  }

  test("approx weighted quantile degrades gracefully: monotone in q") {
    import graft.agg.ApproxWeightedQuantile
    import org.apache.spark.sql.functions.col
    val rnd = new Random(19)
    val vals = List.fill(5000)((rnd.nextGaussian() * 100, rnd.nextDouble() + 0.1))
    val df = vals.toDF("v", "w")
    val qs = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map { q =>
      df.agg(ApproxWeightedQuantile(col("v"), col("w"), q, 128))
        .head().getDouble(0)
    }
    assert(qs == qs.sorted) // quantile estimates must be non-decreasing
    // and land within the data range
    assert(qs.head >= vals.map(_._1).min && qs.last <= vals.map(_._1).max)
  }

  test("normalize is idempotent and tokenization-preserving on random text") {
    import graft.ext.TextAnalysis
    import org.apache.spark.sql.functions.col
    val rnd = new Random(23)
    val alphabet = "abcXYZ012 .,;!-_\t\nÄé"
    val texts = List.fill(40)(List.fill(rnd.nextInt(120))(
      alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = texts.toDF("text")
      .select(col("text"), TextAnalysis.normalize("text").as("n1"))
      .select(col("text"), col("n1"), {
        val df2 = TextAnalysis.normalize("n1"); df2
      }.as("n2"),
        TextAnalysis.wordTokens("text").as("t_raw"),
        TextAnalysis.wordTokens("n1").as("t_norm"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2), "normalize must be idempotent")
      // the canonical form keeps the exact token stream the hashers see
      assert(r.getSeq[String](3) == r.getSeq[String](4),
        s"tokens changed for ${r.getString(0).take(40)}")
    }
  }

  test("packSequences: random corpora pack contiguously per shard, " +
      "every doc covers exactly its overlapped sequences") {
    import graft.ext.TextAnalysis
    val rnd = new Random(13)
    for (_ <- 1 to 4) {
      val ctx = 4 + rnd.nextInt(12)
      val sub = 1 + rnd.nextInt(3)
      val docs = (0 until 80).map(i => (i.toLong, s"s${rnd.nextInt(3)}",
        ("w " * rnd.nextInt(10)).trim)).toDF("doc_id", "source", "text")
      val packed = TextAnalysis.packSequences(docs, "text", "doc_id", ctx,
        subShards = sub)
      val shardIdx = if (sub == 1) Seq(0) else Seq(0, 1)
      val rows = packed.collect().map { r =>
        val key = shardIdx.map(r.get(_).toString).mkString("|")
        (key, r.getLong(shardIdx.length), r.getLong(shardIdx.length + 1),
          r.getLong(shardIdx.length + 2), r.getLong(shardIdx.length + 3))
      }
      // zero-token docs never appear
      val nonEmpty = docs.collect()
        .filter(_.getString(2).trim.nonEmpty).map(_.getLong(0)).toSet
      assert(rows.map(_._3).toSet == nonEmpty)
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val perDoc = rs.map(r => (r._3, r._4, r._5)).distinct
          .sortBy(r => (r._2, r._1))
        var run = 0L
        perDoc.foreach { case (_, start, ntok) =>
          assert(start == run, s"gap at offset $start (expected $run)")
          run += ntok
        }
      }
      rows.foreach { case (_, seq, _, start, ntok) =>
        assert(seq >= start / ctx && seq <= (start + ntok - 1) / ctx)
      }
      val byDoc = rows.groupBy(r => (r._1, r._3))
      byDoc.foreach { case (_, drs) =>
        val (start, ntok) = (drs.head._4, drs.head._5)
        assert(drs.length == ((start + ntok - 1) / ctx - start / ctx + 1).toInt)
      }
    }
  }

  test("selectByTokenBudget equals the locally-computed maximal quality prefix") {
    import graft.ext.TextAnalysis
    val rnd = new Random(17)
    for (_ <- 1 to 5) {
      val budget = 5L + rnd.nextInt(40)
      val docs = (0 until 60).map { i =>
        (i.toLong, s"s${rnd.nextInt(3)}", ("w " * rnd.nextInt(8)).trim,
          math.round(rnd.nextDouble() * 100) / 100.0)
      }.toDF("doc_id", "source", "text", "q")
      val got = TextAnalysis.selectByTokenBudget(docs, "text", "doc_id",
        budget, qualityCol = Some("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      assert(got.forall(_._3 <= budget))
      // replicate the greedy prefix on the driver
      val local = docs.collect().map(r => (r.getString(1), r.getLong(0),
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong, r.getDouble(3)))
        .filter(_._3 > 0)
        .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
          val ranked = ds.sortBy(d => (-d._4, d._2))
          var run = 0L
          ranked.takeWhile { d => run += d._3; run <= budget }
            .map(d => (src, d._2)).toSeq
        }.toSet
      assert(got.map(t => (t._1, t._2)).toSet == local)
    }
  }

  test("duplicatedSpans/stripDuplicatedSpans equal a local reference on random corpora") {
    import graft.ext.Dedup
    val rnd = new Random(23)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val k = 3 + trial % 2
      val docs = (0 until 15).map(i => (i.toLong,
        (0 until (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")))
      // driver reference: window counts → duplicated starts → islands
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val grams = toks.toSeq.flatMap { case (id, ts) =>
        if (ts.length >= k)
          (0 to ts.length - k).map(p => (id, p, ts.slice(p, p + k).mkString(" ")))
        else Nil
      }
      val counts = grams.groupBy(_._3).map { case (g, v) => g -> v.length }
      val expSpans = grams.filter(g => counts(g._3) >= 2).groupBy(_._1).toSeq
        .flatMap { case (id, ps) =>
          val islands = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          ps.map(_._2).sorted.foreach { p =>
            if (islands.nonEmpty && islands.last._2 + 1 == p)
              islands(islands.length - 1) = (islands.last._1, p)
            else islands += ((p, p))
          }
          islands.map { case (s, e) => (id, s.toLong, (e - s + k).toLong) }
        }.sorted
      val df = docs.toDF("doc_id", "text")
      val gotSpans = Dedup.duplicatedSpans(df, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(gotSpans == expSpans)
      // strip: rebuilt text = tokens minus covered positions
      val covered = expSpans.groupBy(_._1).map { case (id, ss) =>
        id -> ss.flatMap(s => s._2 until (s._2 + s._3)).toSet
      }
      val expText = docs.map { case (id, _) =>
        id -> toks(id).zipWithIndex
          .filterNot { case (_, i) => covered.getOrElse(id, Set.empty)(i.toLong) }
          .map(_._1).mkString(" ")
      }.toMap
      val gotText = Dedup.stripDuplicatedSpans(df, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(gotText == expText)
    }
  }

  test("bpeTrain equals a local reference BPE on random corpora") {
    import graft.ext.TextAnalysis
    val rnd = new Random(29)
    def mergeSeq(seq: Vector[String], l: String, r: String): Vector[String] = {
      val res = Vector.newBuilder[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
          res += (l + r); i += 2
        } else { res += seq(i); i += 1 }
      }
      res.result()
    }
    for (_ <- 1 to 3) {
      val words = (0 until 40).map(_ =>
        (0 until (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      var vocabSeq: Map[Vector[String], Long] = words.groupBy(identity)
        .map { case (w, v) => w.map(_.toString).toVector -> v.length.toLong }
      val expected = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      var done = false
      for (r <- 1 to 6 if !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        vocabSeq.foreach { case (seq, c) =>
          seq.sliding(2).filter(_.length == 2)
            .foreach(p => pc((p(0), p(1))) += c)
        }
        if (pc.isEmpty) done = true
        else {
          val ((l, rr), n) = pc.toSeq
            .sortBy { case ((a, b), cnt) => (-cnt, a, b) }.head
          expected += ((r.toLong, l, rr, n))
          vocabSeq = vocabSeq.map { case (seq, c) => mergeSeq(seq, l, rr) -> c }
        }
      }
      val got = TextAnalysis.bpeTrain(
          Seq(words.mkString(" ")).toDF("text"), "text", 6)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(got.toSeq == expected.toSeq)
      // merge counts are non-increasing with rank (BPE invariant)
      assert(got.map(_._4).toSeq == got.map(_._4).sorted.reverse.toSeq)
    }
  }

  test("lmScore equals a local reference bigram model on random corpora") {
    import graft.ext.TextAnalysis
    val rnd = new Random(31)
    val vocab = Array("aa", "bb", "cc", "dd")
    for (_ <- 1 to 3) {
      val docs = (0 until 20).map(i => (i.toLong,
        (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")))
      val toks = docs.map { case (id, t) =>
        id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      }.filter(_._2.length >= 2)
      val bgs = toks.map { case (id, ts) => id -> ts.sliding(2).map(p => (p(0), p(1))).toSeq }
      val c2 = bgs.flatMap(_._2).groupBy(identity).map { case (p, v) => p -> v.length }
      val c1 = bgs.flatMap(_._2).groupBy(_._1).map { case (w, v) => w -> v.length }
      val v = toks.flatMap(_._2).distinct.length
      val expected = bgs.map { case (id, bs) =>
        val nll = -bs.map(b =>
          math.log((c2(b) + 1.0) / (c1(b._1) + 1.0 * v))).sum / bs.length
        id -> (bs.length.toLong, nll)
      }.toMap
      val got = TextAnalysis.lmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(_._1).toSet == expected.keySet)
      got.foreach { case (id, n, nll) =>
        assert(n == expected(id)._1)
        assert(math.abs(nll - expected(id)._2) < 1e-6)
      }
    }
  }

  test("ksTest equals a local reference KS on random samples") {
    import graft.ext.Eval
    val rnd = new Random(47)
    for (trial <- 1 to 4) {
      // shifted second sample on later trials so drift goes both ways
      val xs = (0 until 30 + rnd.nextInt(40)).map(_ => rnd.nextInt(12).toDouble)
      val ys = (0 until 30 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(12) + (if (trial % 2 == 0) 3 else 0)).toDouble)
      val (na, nb) = (xs.length.toLong, ys.length.toLong)
      val values = (xs ++ ys).distinct.sorted
      val dExp = values.map { v =>
        val ca = xs.count(_ <= v).toLong
        val cb = ys.count(_ <= v).toLong
        math.abs(ca * nb - cb * na)
      }.max.toDouble / (na.toDouble * nb.toDouble)
      val r = Eval.ksTest(xs.toDF("v"), ys.toDF("v"), "v").collect().head
      assert(r.getLong(0) == na && r.getLong(1) == nb)
      assert(r.getDouble(2) == dExp, s"trial $trial: D mismatch")
      val dCritExp = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb.toDouble))
      assert(r.getDouble(3) == dCritExp)
      assert(r.getInt(4) == (if (dExp > dCritExp) 1 else 0))
    }
  }

  test("ksTestBy rows equal independent ksTest(group, rest) on random grouped samples") {
    // the per-slice derivation (global-minus-own cumulatives, the dense
    // grid's jump-point coverage) is exactly the clever arithmetic a
    // future edit silently breaks — q185's oracle covers one dataset,
    // this property covers the family (VERDICT r11 task 7)
    import graft.ext.Eval
    val rnd = new Random(53)
    for (trial <- 1 to 3) {
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until 120 + rnd.nextInt(120)).map { _ =>
        val g = "g" + rnd.nextInt(nGroups)
        // per-group shifted discrete values so some slices genuinely drift
        (g, (rnd.nextInt(10) + 2 * (g.last - '0')).toDouble)
      }
      val df = rows.toDF("g", "v")
      val by = Eval.ksTestBy(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(by.keySet == rows.map(_._1).toSet, s"trial $trial: group set")
      by.keySet.foreach { g =>
        val own = df.filter($"g" === g)
        val rest = df.filter($"g" =!= g)
        val pair = Eval.ksTest(own, rest, "v").collect().head.toSeq
        assert(by(g) == pair,
          s"trial $trial group $g: ksTestBy ${by(g)} != ksTest $pair")
      }
    }
  }

  test("rankSumTest equals a local reference Mann-Whitney on random samples") {
    import graft.ext.Eval
    val rnd = new Random(61)
    for (trial <- 1 to 4) {
      val xs = (0 until 25 + rnd.nextInt(40)).map(_ => rnd.nextInt(9).toDouble)
      val ys = (0 until 25 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(9) + (if (trial % 2 == 0) 2 else 0)).toDouble)
      val (na, nb) = (xs.length.toDouble, ys.length.toDouble)
      val all = xs ++ ys
      // mid-ranks over the combined sample, exact 0.5-multiples
      val byV = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vals = byV.keys.toSeq.sorted
      var cum = 0L
      val rank = vals.map { v =>
        val t = byV(v); cum += t
        v -> ((cum - t).toDouble + (t + 1L).toDouble / 2.0)
      }.toMap
      val rb = ys.map(rank).sum // integer+halves: order-free exact
      val ties = vals.map(v => { val t = byV(v); t * t * t - t }).sum
      val n = na + nb
      val u = rb - nb * (nb + 1.0) / 2.0
      val sigma2 = na * nb / 12.0 * ((n + 1.0) - ties.toDouble / (n * (n - 1.0)))
      val zExp = (u - na * nb / 2.0) / math.sqrt(sigma2)
      val r = Eval.rankSumTest(xs.toDF("v"), ys.toDF("v"), "v").collect().head
      assert(r.getLong(0) == xs.length && r.getLong(1) == ys.length)
      assert(r.getDouble(2) == u, s"trial $trial: U mismatch")
      assert(r.getDouble(3) == zExp, s"trial $trial: z mismatch")
      assert(r.getInt(4) == (if (math.abs(zExp) > 1.96) 1 else 0))
    }
  }

  test("rankSumTestBy rows equal independent rankSumTest(rest, group) on random grouped samples") {
    // the global-rank-table derivation (one combined ranking serves every
    // group) is the cleverness a future edit could silently break —
    // same pin discipline as the ksTestBy property
    import graft.ext.Eval
    val rnd = new Random(79)
    for (trial <- 1 to 3) {
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until 100 + rnd.nextInt(120)).map { _ =>
        val g = "g" + rnd.nextInt(nGroups)
        (g, (rnd.nextInt(8) + 3 * (g.last - '0')).toDouble)
      }
      val df = rows.toDF("g", "v")
      val by = Eval.rankSumTestBy(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(by.keySet == rows.map(_._1).toSet)
      by.keySet.foreach { g =>
        val own = df.filter($"g" === g)
        val rest = df.filter($"g" =!= g)
        // ref = (n_a=rest, n_b=group, u, z, drifted); by row =
        // (n_g, n_rest, u, z, drifted)
        val ref = Eval.rankSumTest(rest, own, "v").collect().head.toSeq
        val expect = Seq(ref(1), ref(0)) ++ ref.drop(2)
        assert(by(g) == expect,
          s"trial $trial group $g: ${by(g)} != $expect")
      }
    }
  }

  test("chiSquareDriftBy rows equal independent chiSquareDrift(rest, group) at the 6dp grain") {
    import graft.ext.Outliers
    val rnd = new Random(83)
    for (trial <- 1 to 3) {
      val pool = Array("a", "b", "c", "d")
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until 120 + rnd.nextInt(120)).map { _ =>
        val g = "g" + rnd.nextInt(nGroups)
        // per-group category skew so some slices genuinely drift
        (g, pool((rnd.nextInt(4) + (g.last - '0')) % 4))
      }
      val df = rows.toDF("g", "c")
      val by = Outliers.chiSquareDriftBy(df, "g", "c").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(by.keySet == rows.map(_._1).toSet)
      by.keySet.foreach { g =>
        val own = df.filter($"g" === g).select("c")
        val rest = df.filter($"g" =!= g).select("c")
        val ref = Outliers.chiSquareDrift(rest, own, "c").collect().head
        val r = by(g)
        assert(r.getLong(1) == ref.getLong(1) && // n_g = pairwise n_live
          r.getLong(2) == ref.getLong(0) &&      // n_rest = pairwise n_base
          r.getLong(3) == ref.getLong(2), s"counts/k for $g")
        // the two sum the k terms in different orders — equal at the 6 dp
        // emission grain plus an ulp of rounding slack
        assert(math.abs(r.getDouble(4) - ref.getDouble(3)) <= 1.1e-6,
          s"trial $trial group $g: chi2 ${r.getDouble(4)} vs ${ref.getDouble(3)}")
        assert(r.getDouble(5) == ref.getDouble(4), s"crit for $g")
        assert(r.getInt(6) == ref.getInt(5), s"flag for $g")
      }
    }
  }

  test("chiSquareDrift equals a local reference chi2 on random categorical mixes") {
    import graft.ext.Outliers
    val rnd = new Random(71)
    val pool = Array("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(4)
      val base = (0 until 80 + rnd.nextInt(80)).map(_ => pool(rnd.nextInt(k)))
      // live mix skewed toward the tail categories on even trials
      val live = (0 until 80 + rnd.nextInt(80)).map(_ =>
        pool(if (trial % 2 == 0) k - 1 - rnd.nextInt(1 + rnd.nextInt(k))
             else rnd.nextInt(k)))
      val cb = base.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cl = live.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cats = (cb.keySet ++ cl.keySet).toSeq.sorted
      val (nB, nL) = (base.size.toDouble, live.size.toDouble)
      val nT = nB + nL
      val chi2Exp = cats.map { c =>
        val (ob, ol) = (cb.getOrElse(c, 0L).toDouble, cl.getOrElse(c, 0L).toDouble)
        val cat = ob + ol
        val (eb, el) = (nB * cat / nT, nL * cat / nT)
        (ob - eb) * (ob - eb) / eb + (ol - el) * (ol - el) / el
      }.sum
      val r = Outliers.chiSquareDrift(base.toDF("c"), live.toDF("c"), "c")
        .collect().head
      assert(r.getLong(0) == base.size && r.getLong(1) == live.size)
      assert(r.getLong(2) == cats.size)
      // Spark sums the k terms in partition order, the reference in sorted
      // order — equal at the 6 dp emission grain plus an ulp of slack
      assert(math.abs(r.getDouble(3) - chi2Exp) < 2e-6,
        s"trial $trial: chi2 ${r.getDouble(3)} vs $chi2Exp")
      // the flag must be the pure function of the emitted columns
      assert(r.getInt(5) == (if (r.getDouble(3) > r.getDouble(4)) 1 else 0))
    }
  }

  test("pplBuckets terciles are consistent with lmScore and exact percentiles") {
    import graft.ext.TextAnalysis
    val rnd = new Random(37)
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    val docs = (0 until 30).map(i => (i.toLong,
      (0 until (2 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val scored = TextAnalysis.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // exact (n−1)·q percentile over the scored nll values
    def pct(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val p = q * (s.length - 1)
      val lo = p.toInt
      val frac = p - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    val nlls = scored.values.toSeq
    val (t1, t2) = (pct(nlls, 1.0 / 3), pct(nlls, 2.0 / 3))
    val got = TextAnalysis.pplBuckets(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(got.map(_._1).toSet == scored.keySet)
    got.foreach { case (id, nll, bucket) =>
      assert(nll == scored(id))
      val exp = if (nll <= t1) "head" else if (nll <= t2) "middle" else "tail"
      assert(bucket == exp, s"doc $id nll=$nll t1=$t1 t2=$t2")
    }
    assert(got.map(_._3).toSet == Set("head", "middle", "tail"))
  }

  test("dsirWeights equals a local reference and ranks target-like docs higher") {
    import graft.ext.TextAnalysis
    import org.apache.spark.sql.functions.col
    // target speaks (xx yy)+; one candidate mimics it, one is disjoint
    val docs = Seq(
      (0L, "tgt", "xx yy xx yy xx yy"), (1L, "tgt", "xx yy zz xx yy"),
      (2L, "raw", "xx yy xx yy"), (3L, "raw", "pp qq rr pp qq"),
      (4L, "raw", "xx yy pp qq"), (5L, "raw", "zz zz zz"))
    val df = docs.toDF("doc_id", "source", "text")
    val B = 16
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def feats(t: String): Seq[Long] = {
      val ts = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      val uni = ts.map(h)
      val bi = if (ts.length >= 2)
        ts.sliding(2).map(p => h(p(0) + " " + p(1))).toSeq else Nil
      (uni ++ bi).map(x => x % B)
    }
    val tgtF = docs.filter(_._2 == "tgt").flatMap(d => feats(d._3))
    val rawF = docs.filter(_._2 == "raw").flatMap(d => feats(d._3))
    val ct = tgtF.groupBy(identity).map { case (s, v) => s -> v.length }
    val cr = rawF.groupBy(identity).map { case (s, v) => s -> v.length }
    val expected = docs.filter(_._2 == "raw").map { case (id, _, t) =>
      val fs = feats(t)
      val lw = fs.map(s =>
        math.log((ct.getOrElse(s, 0) + 1.0) / (tgtF.length + B)) -
        math.log((cr.getOrElse(s, 0) + 1.0) / (rawF.length + B))).sum
      id -> ((fs.length.toLong, lw))
    }.toMap
    val got = TextAnalysis.dsirWeights(df, "doc_id", "text",
        col("source") === "tgt", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == expected.keySet)
    val byId = got.map(g => g._1 -> g).toMap
    expected.foreach { case (id, (n, lw)) =>
      assert(byId(id)._2 == n)
      assert(math.abs(byId(id)._3 - lw) < 1e-6)
    }
    // the mimic outranks the partial overlap, which outranks the disjoint
    assert(byId(2L)._3 > byId(4L)._3 && byId(4L)._3 > byId(3L)._3)
  }

  test("corpusReport matches a local reference datasheet") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (0L, "s1", "en", "one two three"), (1L, "s1", "en", "one two three"),
      (2L, "s1", "de", "vier funf"), (3L, "s2", "en", "a b c d"),
      (4L, "s2", "fr", "   "), (5L, "s2", "fr", "e f"))
    val got = TextAnalysis.corpusReport(
        docs.toDF("doc_id", "source", "lang", "text"))
      .orderBy("source").collect()
    assert(got.length == 2)
    val s1 = got(0)
    assert(s1.getString(0) == "s1" && s1.getLong(1) == 3)
    assert(s1.getLong(2) == 8)               // 3 + 3 + 2 tokens
    assert(s1.getDouble(4) == math.floor((1.0 - 2.0 / 3) * 1e6 + 0.5) / 1e6)
    assert(s1.getLong(7) == 2)               // en, de
    val s2 = got(1)
    assert(s2.getLong(1) == 3 && s2.getLong(2) == 6) // 4 + 0 + 2 tokens
    assert(s2.getDouble(4) == 0.0)           // all distinct
    // p50 of lengths (7, 3, 3) = 3.0; p90 = 0.9·(n−1) interpolation
    assert(s2.getDouble(5) == 3.0)
    assert(math.abs(s2.getDouble(6) - (3 + 0.8 * 4)) < 1e-9)
    assert(s2.getLong(7) == 2)               // en, fr
  }

  test("−99 sentinel masking round-trips through unmask") {
    import graft.sources.Ingest
    val rnd = new Random(11)
    for (_ <- 1 to 10) {
      // -99 itself cannot round-trip (it IS the sentinel) — excluded per
      // the convention's own contract
      val clean = List.fill(rnd.nextInt(40))(
        if (rnd.nextBoolean()) Some(rnd.nextDouble() * 400 - 200) else None)
        .map(_.filter(_ != -99.0))
      val df = clean.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val masked = Ingest.maskSentinel(Ingest.unmaskSentinel(df))
      val got = masked.orderBy("id").collect().map(r =>
        if (r.isNullAt(1)) None else Some(r.getDouble(1))).toList
      assert(got == clean)
    }
  }

  test("psiDriftBy and embeddingDriftBy rows equal their pairwise members on random grouped samples") {
    // the r13 by-slice cells join the family standard: every by-slice
    // view is property-pinned against the independent pairwise member
    // (the ksTestBy/rankSumTestBy/chiSquareDriftBy precedent)
    import org.apache.spark.sql.functions.{col, round => sround, sum => ssum}
    import graft.ext.{Outliers, Similarity}
    val rnd = new Random(83)
    for (trial <- 1 to 3) {
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until 150 + rnd.nextInt(150)).map { _ =>
        val g = "g" + rnd.nextInt(nGroups)
        // per-group shifted support in [0, 1], 2dp-rounded (bounded grid)
        val v = math.min(0.99,
          (rnd.nextInt(60) + 8 * (g.last - '0')).toDouble / 100.0)
        (g, v)
      }
      val df = rows.toDF("g", "v")
      val by = Outliers.psiDriftBy(df, "g", "v").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(by.keySet == rows.map(_._1).toSet)
      by.keySet.foreach { g =>
        val own = df.filter($"g" === g)
        val rest = df.filter($"g" =!= g)
        val psi = Outliers.psiDrift(rest, own, "v")
          .agg(sround(ssum(col("psi")), 6)).first().getDouble(0)
        assert(by(g) == Seq(own.count(), rest.count(), psi,
          if (psi > 0.25) 1 else 0),
          s"trial $trial group $g: ${by(g)} != member psi $psi")
      }
      // embedding member: random 6-dim vectors with per-group offsets
      val dim = 6
      val erows = (0 until 60 + rnd.nextInt(60)).map { i =>
        val g = "g" + rnd.nextInt(nGroups)
        (i.toLong, g,
          Seq.tabulate(dim)(d => rnd.nextGaussian() + (g.last - '0') *
            (if (d == 0) 1.5 else 0.0)))
      }
      val edf = erows.toDF("vec_id", "g", "embedding")
      val eby = Similarity.embeddingDriftBy(edf, "g", "embedding")
        .collect().map(r => r.getString(0) -> r).toMap
      eby.keySet.foreach { g =>
        val own = edf.filter($"g" === g)
        val rest = edf.filter($"g" =!= g)
        val m = Similarity.embeddingDrift(rest, own).collect().head
        val r = eby(g)
        assert(r.getLong(1) == m.getLong(1) && r.getLong(2) == m.getLong(0))
        // rest mean derived from slice means vs averaged rows: equal up
        // to float summation order, inside the 6 dp emission grain
        if (!m.isNullAt(2))
          assert(math.abs(r.getDouble(3) - m.getDouble(2)) <= 1.1e-6,
            s"trial $trial group $g cos")
        if (!m.isNullAt(3))
          assert(math.abs(r.getDouble(4) - m.getDouble(3)) <= 1.1e-6,
            s"trial $trial group $g l2")
      }
    }
  }

  test("vocabDivergenceBy rows equal the pairwise vocabDivergence(own, rest) on random corpora") {
    // the r14 text-member by-slice cell joins the family standard: the
    // fixed fixture in Round14OpsSuite pins one dataset; random corpora
    // exercise vocabulary overlap degrees (disjoint, partial, identical)
    // and group-size skew
    import graft.ext.TextAnalysis
    val rnd = new Random(97)
    val lexicon = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (trial <- 1 to 3) {
      val nGroups = 2 + rnd.nextInt(3)
      val rows = (0 until 80 + rnd.nextInt(80)).map { i =>
        val g = "g" + rnd.nextInt(nGroups)
        // per-group lexicon window: overlapping slices of the lexicon,
        // so some tokens are shared and some are group-private
        val base = (g.last - '0') * 3
        val text = Seq.fill(3 + rnd.nextInt(5))(
          lexicon((base + rnd.nextInt(6)) % lexicon.size)).mkString(" ")
        (i.toLong, g, text)
      }
      val df = rows.toDF("doc_id", "g", "text")
      val by = TextAnalysis.vocabDivergenceBy(df, "g", "text").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(by.keySet == rows.map(_._2).toSet)
      by.keySet.foreach { g =>
        val own = df.filter($"g" === g)
        val rest = df.filter($"g" =!= g)
        val m = TextAnalysis.vocabDivergence(own, rest, "text").head()
        val r = by(g)
        // counts and the union vocabulary are integer-exact (own ∪ rest
        // = corpus, so the member's union vocab IS the global one)
        assert(r.getLong(1) == m.getLong(0) &&
          r.getLong(2) == m.getLong(1) && r.getLong(3) == m.getLong(2),
          s"trial $trial group $g counts")
        // divergences: same smoothing arithmetic, float summation order
        // differs across plans — inside the 6 dp emission grain
        for ((bi, mi) <- Seq(4 -> 3, 5 -> 4, 6 -> 5))
          assert(math.abs(r.getDouble(bi) - m.getDouble(mi)) <= 1.1e-6,
            s"trial $trial group $g col $bi")
      }
    }
  }

  test("windowed drift aggregates equal their pairwise members on random streams (VERDICT r12 task 8)") {
    // the fixed fixtures in EventStreamSuite pin one dataset; randomized
    // baselines exercise the two-pointer merge walk's edge cases (equal
    // values at array boundaries, live values outside the baseline
    // support on either end, windows with a single distinct value)
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    import graft.ext.{Eval, Outliers}
    val rnd = new Random(71)
    for (trial <- 1 to 3) {
      // half-integer values force ties and off-support probes; shift some
      // trials so the live support extends past the baseline's max
      val bVals = (0 until 30 + rnd.nextInt(50))
        .map(_ => rnd.nextInt(14) / 2.0)
      val nDays = 2 + rnd.nextInt(2)
      val live = (0 until nDays * 40).map { i =>
        val day = i / 40 + 1
        val shift = if (day == 2 && trial % 2 == 0) 3.5 else 0.0
        (i.toLong, new Timestamp(
          Timestamp.valueOf(f"2024-01-0$day 00:00:00").getTime +
            (i % 40) * 60000L),
          rnd.nextInt(16) / 2.0 + shift)
      }.toDF("id", "ts", "v")
      val base = bVals.toDF("v")
      val (bv, bc) = Eval.ksBaseline(base, "v")
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getTimestamp(0) -> r.toSeq.drop(1)).toMap
      val ks = cells(Eval.ksDriftWindowed(live, "ts", "v", bv, bc))
      val rs = cells(Eval.rankSumDriftWindowed(live, "ts", "v", bv, bc))
      assert(ks.size == nDays && rs.size == nDays)
      for (ws <- ks.keys) {
        val dayEnd = new Timestamp(ws.getTime + 86400000L)
        val slice = live.filter(col("ts") >= ws && col("ts") < dayEnd)
        val ksRef = Eval.ksTest(base, slice, "v").collect().head
        assert(ks(ws) == ksRef.toSeq.drop(1),
          s"trial $trial $ws: ks ${ks(ws)} != ${ksRef.toSeq.drop(1)}")
        val rsRef = Eval.rankSumTest(base, slice, "v").collect().head
        assert(rs(ws) == rsRef.toSeq.drop(1),
          s"trial $trial $ws: rankSum ${rs(ws)} != ${rsRef.toSeq.drop(1)}")
      }
      // chi2 member on a random category stream against a random baseline
      val cats = Seq("x", "y", "z", "w")
      val baseCat = (0 until 40 + rnd.nextInt(40))
        .map(_ => cats(rnd.nextInt(3))).toDF("c")
      val liveCat = (0 until nDays * 40).map { i =>
        val day = i / 40 + 1
        // day-dependent skew, and category w only appears live
        val c = cats(rnd.nextInt(if (day == 2) 4 else 3))
        (i.toLong, new Timestamp(
          Timestamp.valueOf(f"2024-01-0$day 00:00:00").getTime +
            (i % 40) * 60000L), c)
      }.toDF("id", "ts", "c")
      val (bcnt, _) = Outliers.chiSquareBaseline(baseCat, "c")
      val chi = cells(Outliers
        .chiSquareDriftWindowed(liveCat, "ts", "c", bcnt))
      assert(chi.size == nDays)
      for (ws <- chi.keys) {
        val dayEnd = new Timestamp(ws.getTime + 86400000L)
        val slice = liveCat.filter(col("ts") >= ws && col("ts") < dayEnd)
        val ref = Outliers.chiSquareDrift(baseCat, slice, "c")
          .collect().head
        val got = chi(ws)
        assert(got(0) == ref.getLong(1) && got(1) == ref.getLong(2),
          s"trial $trial $ws: chi2 counts $got vs ${ref.toSeq}")
        // sorted-category vs partition-order term sums: 6 dp grain
        assert(math.abs(got(2).asInstanceOf[Double] - ref.getDouble(3))
          <= 1.1e-6, s"trial $trial $ws: chi2 stat")
        assert(got(3).asInstanceOf[Double] == ref.getDouble(4))
        assert(got(4) == ref.getInt(5))
      }
    }
  }
}

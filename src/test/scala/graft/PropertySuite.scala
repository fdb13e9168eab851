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
}

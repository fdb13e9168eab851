package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

/** Round-8 operators: domain cap, heavy hitters, bloom decontamination,
  * snapshot diff, weighted sampling, robust outliers. */
class Round8OpsSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  // ---- capPerGroupByScore ------------------------------------------------

  test("capPerGroupByScore equals the naive rank window, ties and small groups included") {
    val df = Seq(
      // group a: 6 rows, score ties at 5
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 7.0), ("a", 4L, 1.0),
      ("a", 5L, 5.0), ("a", 6L, 9.0),
      // group b: smaller than the cap
      ("b", 7L, 2.0), ("b", 8L, 3.0)).toDF("g", "id", "score")
    val got = Sampling.capPerGroupByScore(df, "g", "score", "id", 3)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val want = df.withColumn("r", row_number().over(w)).filter($"r" <= 3)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // score ties at the boundary break toward the smaller id
    assert(got.toSeq == Seq(("a", 1L), ("a", 3L), ("a", 6L), ("b", 7L), ("b", 8L)))
  }

  test("capPerGroupByScore compiles to a WindowGroupLimit partial top-N") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 3.0)).toDF("g", "id", "score")
    val plan = Sampling.capPerGroupByScore(df, "g", "score", "id", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit partial top-N in plan:\n$plan")
  }

  // ---- weightedSampleK ---------------------------------------------------

  test("weightedSampleK returns k rows and replays the A-ES formula exactly") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSampleK(df, "id", "w", 20, salt = "t")
      .select("id").as[Long].collect().toSet
    // replay: u from the same md5 bucket, key = -ln(u)/w, 20 smallest
    val bucketed = df.select($"id", $"w",
      Sampling.hashBucket($"id", "t").as("b")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = bucketed.map { case (id, w, b) =>
      (-math.log((b.toDouble + 0.5) / Sampling.Space.toDouble) / w, id)
    }.sortBy(identity).take(20).map(_._2).toSet
    assert(got == want)
    assert(got.size == 20)
  }

  test("weightedSampleK plans as TakeOrderedAndProject (no global sort)") {
    val df = (1L to 50L).map(i => (i, 1.0 + i)).toDF("id", "w")
    val plan = Sampling.weightedSampleK(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k plan, got:\n$plan")
  }

  test("weightedSampleK favors heavy weights and caps at the row count") {
    // two strata: weight 50 vs weight 1 — the heavy half should dominate
    val df = (1L to 100L).map(i => (i, if (i <= 50) 50.0 else 1.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSampleK(df, "id", "w", 30, salt = "bias")
      .select("id").as[Long].collect()
    assert(picked.count(_ <= 50L) >= 25, s"heavy stratum underdrawn: ${picked.toSeq}")
    assert(Sampling.weightedSampleK(df, "id", "w", 500).count() == 100)
  }

  // ---- heavyHitters / MisraGriesAgg --------------------------------------

  test("heavyHitters equals the exact top-k on a Zipf-ish corpus") {
    // token t_i appears ~ 200/i times; plenty of one-off noise tokens
    val words = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i")) ++
      (1 to 300).map(i => s"noise$i")
    val docs = words.grouped(17).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "text", 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs.select(explode(TextAnalysis.wordTokens("text")).as("t"))
      .groupBy("t").count().orderBy($"count".desc, $"t".asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("MisraGries retains every value above the n/(c+1) frequency bound") {
    // n = 1000; capacity 9 → guarantee threshold n/10 = 100
    val stream = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 500).map(i => s"cold$i")
    val retained = stream.toDF("t")
      .agg(graft.agg.MisraGriesAgg(col("t"), 9))
      .head().getSeq[String](0).toSet
    assert(retained.contains("hot1") && retained.contains("hot2"))
    assert(retained.size <= 9)
  }

  test("TokenNgramHashes kernel == composed split/slice/xxhash64 chain, edges included") {
    val texts = Seq("one two three four five six seven eight nine",
      "exactly three tokens", "two tok", "", "   ",
      "\tleading tab keeps an empty first token after space-only trim x y z",
      "trailing tab after spaces  \t", "a  b   c d e f g h i")
    val df = texts.toDF("t")
    val k = 3
    val got = df.select(graft.functions.TokenNgramHashes.column($"t", k).as("h"))
      .as[Seq[Long]].collect().toSeq
    val composed = df
      .select(split(trim($"t"), "\\s+").as("toks"))
      .select(when(size($"toks") >= k,
        transform(sequence(lit(0), size($"toks") - k),
          i => xxhash64(concat_ws(" ", slice($"toks", i + 1, lit(k))))))
        .otherwise(array().cast("array<bigint>")).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(got == composed)
  }

  test("BigramHashes kernel == composed struct-explode xxhash64 chain") {
    val texts = Seq("the quick brown fox", "one", "", "a a a", "Mixed CASE 42!")
    val df = texts.toDF("t")
    val got = df.select($"t",
      explode(graft.functions.BigramHashes.column($"t")).as("b"))
      .select($"t", $"b.w1h", $"b.bh")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    val ts = TextAnalysis.wordTokens("t")
    val composed = df.filter(size(ts) >= 2)
      .select($"t", explode(transform(sequence(lit(2), size(ts)),
        g => struct(element_at(ts, g - 1).as("w1"), element_at(ts, g).as("w2"))))
        .as("b"))
      .select($"t", xxhash64($"b.w1"), xxhash64($"b.w1", $"b.w2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    assert(got == composed)
  }

  test("DsirSlots kernel == composed uni+bigram md5-slot chain") {
    val texts = Seq("The quick brown-fox 42 jumps", "single", "", "!!!",
      "a b a b a")
    val df = texts.toDF("t")
    val buckets = 64
    val got = df.select(graft.functions.DsirSlots.column($"t", buckets).as("s"))
      .as[Seq[Int]].collect().toSeq.map(_.sorted)
    val ts = TextAnalysis.wordTokens("t")
    val uni = df.select($"t", explode(ts).as("f"))
    val bi = df.filter(size(ts) >= 2).select($"t",
      explode(transform(sequence(lit(2), size(ts)), g =>
        concat(element_at(ts, g - 1), lit(" "), element_at(ts, g)))).as("f"))
    val composedRows = uni.unionByName(bi)
      .select($"t", pmod(
        expr("CAST(conv(substring(md5(f),1,15),16,10) AS BIGINT)"),
        lit(buckets)).cast("int").as("slot"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val composed = texts.map(t => composedRows.getOrElse(t, Seq.empty))
    assert(got == composed)
  }

  test("MinMd5Ngram kernel == composed md5/substr formula, edges included") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "exactly8", "short", "", "åccénted ünicode tèxt here",
      "aaaaaaaaaaaaaaaaaaaa")
    val df = texts.toDF("t")
    val got = df.select(TextAnalysis.fingerprint("t").as("fp"))
      .as[String].collect().toSeq
    val composed = df.select(array_min(transform(
      sequence(lit(1), greatest(length($"t") - 7, lit(1))),
      i => md5($"t".substr(i, lit(8))))).as("fp")).as[String].collect().toSeq
    assert(got == composed)
  }

  // ---- decontaminateBloom ------------------------------------------------

  test("decontaminateBloom equals the exact join shape, null text surviving") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "alpha beta gamma something else"), // shares a 3-gram with bench
      (4L, null.asInstanceOf[String]),
      (5L, "totally clean text here indeed")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Dedup.decontaminateBloom(corpus, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = Dedup.decontaminate(corpus, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got == Seq(2L, 4L, 5L)) // 1 and 3 share the bench 3-gram; null survives
  }

  // ---- snapshotDiff ------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed/unchanged, null text included") {
    val old = Seq(
      (1L, "same"), (2L, "before"), (3L, "gone"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val cur = Seq(
      (1L, "same"), (2L, "after"), (4L, "fresh"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val got = Dedup.snapshotDiff(old, cur, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("incrementalFeatures == full recompute, touching only the delta") {
    def features(c: org.apache.spark.sql.DataFrame) =
      c.select($"id", length($"text").as("len"))
    val old = Seq((1L, "aaa"), (2L, "bb"), (3L, "gone")).toDF("id", "text")
    val cur = Seq((1L, "aaa"), (2L, "bb changed"), (4L, "new")).toDF("id", "text")
    val oldFeat = features(old)
    var touched: Set[Long] = Set.empty
    val got = graft.pipeline.CorpusCuration.incrementalFeatures(
      old, oldFeat, cur, idCol = "id") { delta =>
      touched = delta.select("id").as[Long].collect().toSet
      features(delta)
    }.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val full = features(cur).collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == full)
    assert(touched == Set(2L, 4L)) // changed + added only; 1 carried, 3 dropped
  }

  // ---- funnel / retention ------------------------------------------------

  test("funnel keeps ordered in-window chains, greedy earliest per step") {
    def ev(id: Long, u: Long, t: Long, ty: String) =
      (id, new java.sql.Timestamp(t * 1000L), u, ty)
    val events = Seq(
      // user 1: completes view(10) -> click(20) -> purchase(30)
      ev(1, 1, 10, "view"), ev(2, 1, 20, "click"), ev(3, 1, 30, "purchase"),
      // user 2: purchase BEFORE the view — no ordered chain
      ev(4, 2, 10, "purchase"), ev(5, 2, 20, "view"), ev(6, 2, 30, "click"),
      // user 3: ordered but the chain closes outside the 100 s window
      ev(7, 3, 10, "view"), ev(8, 3, 50, "click"), ev(9, 3, 200, "purchase"),
      // user 4: greedy earliest — duplicate earlier steps don't block
      ev(10, 4, 5, "view"), ev(11, 4, 6, "view"), ev(12, 4, 7, "click"),
      ev(13, 4, 8, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventStream.funnel(
      events, Seq("view", "click", "purchase"), 100L)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 10000000L, 20000000L, 30000000L),
      (4L, 5000000L, 7000000L, 8000000L)))
  }

  test("cohortRetention counts distinct users per (cohort, offset) week") {
    val Week = 7L * 86400L
    def ev(id: Long, u: Long, week: Long) =
      (id, new java.sql.Timestamp(week * Week * 1000L + 1000L), u, "view")
    val events = Seq(
      ev(1, 1, 0), ev(2, 1, 0), ev(3, 1, 2), // user 1: cohort 0, active w0+w2
      ev(4, 2, 0), ev(5, 2, 1),              // user 2: cohort 0, active w0+w1
      ev(6, 3, 1))                           // user 3: cohort 1, active w1
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventStream.cohortRetention(events)
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  // ---- resizeNearest -----------------------------------------------------

  test("resizeNearest: stride-2 subsample matches the analytic raster") {
    val ids = Seq(5L, 12L, 40L).toDF("doc_id")
    val resized = Multimodal.decodeFeatures(
      Multimodal.resizeNearest(Multimodal.synthesizeImages(ids, "doc_id"), 2, 2))
      .collect().map(f => f.id -> f).toMap
    for (id <- Seq(5L, 12L, 40L)) {
      val (w, h) = ((id % 13 + 3).toInt, (id % 7 + 2).toInt)
      val (nw, nh) = (math.max(1, w / 2), math.max(1, h / 2))
      val pix = for (y <- 0 until nh; x <- 0 until nw)
        yield ((id * 31 + 2 * x * 7 + 2 * y * 13) % 256).toDouble
      val f = resized(id)
      assert((f.width, f.height) == (nw, nh), s"id $id dims")
      assert(math.abs(f.brightness - pix.sum / pix.size) < 1e-9, s"id $id brightness")
    }
  }

  test("noveltyScore: unique docs score 1, duplicated docs score 0, mixed in between") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, shared), (2L, shared), // exact near-dups: every shingle shared
      (3L, "completely original words nowhere else written down"),
      (4L, shared + " plus unique continuation tokens here")).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 0.0 && got(2L) == 0.0)
    assert(got(3L) == 1.0)
    assert(got(4L) > 0.0 && got(4L) < 1.0)
  }

  // ---- robustFlags -------------------------------------------------------

  test("flagsWith scores a STREAM against batch-trained thresholds, batch == stream") {
    val hist = ((1L to 50L).map(i => ("a", i, (i % 11).toDouble)) ++
      Seq(("a", 98L, 500.0))).toDF("k", "id", "v")
    val th = Outliers.thresholds(hist, "k", "v")
    val live = Seq(("a", 201L, 400.0), ("a", 202L, 5.0), ("a", 203L, -400.0))
      .toDF("k", "id", "v")
    val src = java.nio.file.Files.createTempDirectory("graft_outl_src").toString
    live.write.mode("append").parquet(src)
    val streamed = spark.readStream.schema(live.schema).parquet(src)
    val q = Outliers.flagsWith(streamed, th, "k", "id", "v")
      .writeStream.format("memory").queryName("outl_flags")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("outl_flags").select("id").as[Long].collect().toSet
    val batch = Outliers.flagsWith(live, th, "k", "id", "v")
      .select("id").as[Long].collect().toSet
    assert(got == batch)
    assert(got == Set(201L, 203L))
  }

  test("robustFlags finds planted outliers and skips zero-MAD keys") {
    val normal = (1L to 50L).map(i => ("a", i, (i % 11).toDouble))
    val planted = Seq(("a", 98L, 500.0), ("a", 99L, -500.0))
    val constant = (200L to 220L).map(i => ("b", i, 42.0)) :+ ("b", 221L, 9000.0)
    val df = (normal ++ planted ++ constant).toDF("k", "id", "v")
    val got = Outliers.robustFlags(df, "k", "id", "v")
      .select("id").as[Long].collect().toSet
    // the two planted extremes flag; the zero-MAD 'b' key flags nothing
    assert(got == Set(98L, 99L))
  }

  // ---- diversityReport / tokenizerFertility ------------------------------

  test("diversityReport: all-identical slice collapses, all-unique slice is 1.0") {
    val df = Seq(
      ("a", "alpha beta gamma delta"), ("a", "alpha beta gamma delta"),
      ("a", "alpha beta gamma delta"),
      ("b", "one two three four"), ("b", "five six seven eight")
    ).toDF("source", "text")
    val got = TextAnalysis.diversityReport(df, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // 'a': 3 docs x 2 distinct shingles each, only 2 distinct overall
    // 'b': 2 docs x 2 shingles, all 4 distinct
    assert(got.toSeq == Seq(("a", 3L, 6L, 2L, 2.0 / 6.0),
      ("b", 2L, 4L, 4L, 1.0)))
  }

  test("diversityReport approx path tracks exact within HLL tolerance") {
    val df = (1L to 300L).map(i =>
      ("s" + (i % 3), s"unique text number $i with shared filler words"))
      .toDF("source", "text")
    val exact = TextAnalysis.diversityReport(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = TextAnalysis.diversityReport(df, "source", "text",
        approx = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.1,
        s"$k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("tokenizerFertility == bpeEncode joined and aggregated by group") {
    val df = Seq(
      (1L, "en", 20L, "the cat sat on the mat"),
      (2L, "en", 15L, "the cat ran far"),
      (3L, "de", 18L, "der hund lief weit")
    ).toDF("doc_id", "lang", "n_chars", "text")
    val got = TextAnalysis.tokenizerFertility(
      df, "doc_id", "text", "lang", "n_chars", 4)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", 4)
    val want = df.join(enc, Seq("doc_id")).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("nc"),
        sum("n_tokens").as("nt"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(2).toDouble / r.getLong(3)))
    assert(got.toSeq == want.toSeq)
    // fertility is chars per token: strictly positive, finite
    assert(got.forall(g => g._5 > 0 && java.lang.Double.isFinite(g._5)))
  }

  // ---- clusterMap / nbQualityScore ---------------------------------------

  test("clusterMap assigns to the nearest seed, seeds to themselves") {
    // 2-d vectors around two well-separated seeds (ids 0 and 1)
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.2f)), (3L, Seq(9.5f, 10.1f)), (4L, Seq(0.1f, 0.9f)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.clusterMap(df, 2).orderBy("cluster").collect()
    val got = rows.map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((0, 3L), (1, 2L)))
    // the zero seed centroid has no direction → its coherence is NULL
    // (not a fault); the non-degenerate cluster's is a valid cosine
    assert(rows(0).isNullAt(2))
    val c1 = rows(1).getDouble(2)
    assert(c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9)
  }

  test("nbQualityScore replays the NB log-odds formula, empty docs get the prior") {
    val df = Seq(
      (1L, 1, "good clean prose text"),
      (2L, 1, "good text"),
      (3L, 0, "spam spam spam junk"),
      (4L, 0, "junk spam"),
      (5L, 0, "")).toDF("doc_id", "pos", "text")
    val got = TextAnalysis.nbQualityScore(df, "doc_id", "text", $"pos" === 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // hand replay: token counts with multiplicity
    val docs = Seq(1L -> ("good clean prose text", true),
      2L -> ("good text", true), 3L -> ("spam spam spam junk", false),
      4L -> ("junk spam", false), 5L -> ("", false))
    val toks = docs.flatMap { case (id, (t, p)) =>
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).map(w => (id, p, w)) }
    val vocab = toks.map(_._3).distinct
    val tp = toks.count(_._2).toLong; val tn = toks.count(!_._2).toLong
    val v = vocab.size.toLong
    def w(tok: String) = {
      val cp = toks.count(x => x._2 && x._3 == tok)
      val cn = toks.count(x => !x._2 && x._3 == tok)
      math.log((cp + 1).toDouble / (tp + v)) -
        math.log((cn + 1).toDouble / (tn + v))
    }
    val prior = math.log(2.0 / 3.0)
    val want = docs.map { case (id, (t, _)) =>
      val dts = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      val score = BigDecimal(prior + dts.map(w).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, dts.size.toLong, score, if (score > 0) 1 else 0)
    }
    assert(got.toSeq == want)
    // the quality slice scores positive, the spam slice negative
    assert(got(0)._4 == 1 && got(2)._4 == 0)
  }

  test("randomProjection replays dot(v, h_i)/sqrt(k) exactly") {
    val vec = Array.tabulate(16)(d => (d * 0.25f) - 1.0f)
    val df = Seq((7L, vec.toSeq)).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, 4).collect()(0)
    val scale = 1.0 / math.sqrt(4.0)
    (0 until 4).foreach { i =>
      val h = Similarity.jlPlane(i, 16)
      var acc = 0.0
      (0 until 16).foreach(d => acc += vec(d).toDouble * h(d))
      assert(got.getDouble(1 + i) == acc * scale) // bit-exact, no tolerance
    }
  }

  test("projectedTopK with shortlist >= corpus == brute force exactly") {
    val rnd = new scala.util.Random(7)
    // 4 well-separated clusters + noise: the structured case JL serves
    // (uniform-random cosines are near-constant and NO shortlist helps)
    val vecs = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(16)(d =>
        (if (d / 4 == c) 3.0f else 0.0f) + rnd.nextFloat() - 0.5f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 2)
    def collect(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val exact = collect(Similarity.bruteForceTopK(df, queries, 5))
    assert(collect(Similarity.projectedTopK(df, queries, 5, 8, 40)) == exact)
    // at a 12-candidate budget the projected shortlist still recalls most
    // of the true top-5 (JL preserves relative distances approximately)
    val budget = collect(Similarity.projectedTopK(df, queries, 5, 8, 12))
    val recall = budget.map(x => (x._1, x._3)).toSet
      .intersect(exact.map(x => (x._1, x._3)).toSet).size.toDouble / exact.size
    assert(recall >= 0.6, s"JL shortlist recall $recall")
  }

  test("randomProjection and nbScoreWith plan with no Exchange (narrow maps)") {
    val emb = Seq((1L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val p1 = Similarity.randomProjection(emb, 4)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"JL projection must not shuffle:\n$p1")
    val df = Seq((1L, 1, "good text"), (2L, 0, "junk")).toDF("doc_id", "pos", "text")
    val model = TextAnalysis.nbTrain(df, "text", $"pos" === 1)
    val p2 = TextAnalysis.nbScoreWith(df, model, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange") && !p2.contains("Join"),
      s"broadcast NB scoring must not shuffle or join:\n$p2")
  }

  test("nbScoreWith == nbQualityScore on the training corpus; stream == batch") {
    val df = Seq(
      (1L, 1, "good clean prose text"), (2L, 1, "good text"),
      (3L, 0, "spam spam spam junk"), (4L, 0, "junk spam"), (5L, 0, ""))
      .toDF("doc_id", "pos", "text")
    val model = TextAnalysis.nbTrain(df, "text", $"pos" === 1)
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq
    assert(rows(TextAnalysis.nbScoreWith(df, model, "doc_id", "text")) ==
      rows(TextAnalysis.nbQualityScore(df, "doc_id", "text", $"pos" === 1)))
    // streamed serving: file source through the same narrow kernel
    val live = df.select("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("graft_nb_src").toString
    live.write.mode("append").parquet(src)
    val streamed = spark.readStream.schema(live.schema).parquet(src)
    val q = TextAnalysis.nbScoreWith(streamed, model, "doc_id", "text")
      .writeStream.format("memory").queryName("nb_scores")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(rows(spark.table("nb_scores")) ==
      rows(TextAnalysis.nbScoreWith(live, model, "doc_id", "text")))
  }

  test("dedupParagraphs strips hot paragraphs, keeps order, canonicalizes gaps") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"alpha one\n\n$boiler\n\n\nbeta two"),
      (2L, s"$boiler\n\ngamma three"),
      (3L, s"delta four\n\n$boiler")).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    // the 3x paragraph is stripped everywhere; survivors keep document
    // order; the \n\n\n run canonicalizes to the \n\n joiner
    assert(got.toSeq == Seq((1L, "alpha one\n\nbeta two"),
      (2L, "gamma three"), (3L, "delta four")))
  }

  // ---- psiDrift ----------------------------------------------------------

  test("psiDrift: identical slices score 0, shift scores positive, edges clamp") {
    val base = (0 until 10).flatMap(b => Seq.fill(5)(b / 10.0 + 0.05))
      .toDF("v")
    // identical distribution → every bucket's psi is exactly 0
    val same = Outliers.psiDrift(base, base, "v").orderBy("bucket").collect()
    assert(same.length == 10)
    assert(same.forall(r => r.getDouble(5) == 0.0))
    assert(same.forall(r => r.getLong(1) == 5L && r.getLong(2) == 5L))
    // live mass moved into the top bucket → that bucket drifts positive,
    // and every bucket's psi term is non-negative by construction
    val live = Seq.fill(50)(0.95).toDF("v")
    val drift = Outliers.psiDrift(base, live, "v").orderBy("bucket").collect()
    assert(drift(9).getDouble(5) > 0.5)
    assert(drift.forall(r => r.getDouble(5) >= 0.0))
    // out-of-range values clamp into the edge bins (counted, not lost)
    val wild = Seq(-5.0, 99.0).toDF("v")
    val clamped = Outliers.psiDrift(base, wild, "v").orderBy("bucket").collect()
    assert(clamped(0).getLong(2) == 1L && clamped(9).getLong(2) == 1L)
  }

  // ---- minhashLshCross ---------------------------------------------------

  test("minhashLshCross == within-union LSH restricted to cross-side pairs") {
    val newDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about spark engines"),
      (3L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val refDf = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "unrelated reference corpus document entirely"),
      (13L, "completely different text about spark engines and scale")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshCross(newDf, refDf, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // same banding over the union: cross pairs are exactly the union's
    // pairs with one member per side (new ids < ref ids here, so id_a=new)
    val newIds = Set(1L, 2L, 3L)
    val want = Dedup.minhashLsh(newDf.unionByName(refDf), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => newIds(p._1) && !newIds(p._2)).toSet
    assert(got == want)
    assert(got.nonEmpty) // the fox and spark docs must pair across sides
  }

  test("minhashLshCrossFromStore == the inline shape (same pairs, same jaccard)") {
    val newDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about spark engines")
    ).toDF("doc_id", "text")
    val refDf = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "unrelated reference corpus document entirely")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_store")
      .toString
    Dedup.writeLshStore(refDf, "text", "doc_id", path)
    def collect(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromStore = collect(
      Dedup.minhashLshCrossFromStore(newDf, spark, path, "text", "doc_id"))
    val inline = collect(
      Dedup.minhashLshCross(newDf, refDf, "text", "doc_id"))
    assert(fromStore == inline)
    assert(fromStore.nonEmpty)
  }

  test("minhashLshCross keeps overlapping id spaces apart (snapshot ids)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    // same table on both sides: every doc pairs with ITSELF across sides
    // at jaccard 1.0, and never within a side
    val got = Dedup.minhashLshCross(docs, docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 1L, 1.0), (2L, 2L, 1.0)))
  }

  // ---- hardNegatives / prototypicality -----------------------------------

  test("hardNegatives at full shortlist == label-filtered brute force") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      (i, c, Seq.tabulate(16)(d =>
        (if (d / 4 == c) 3.0f else 0.0f) + rnd.nextFloat() - 0.5f))
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val queries = df.filter($"vec_id" < 3)
    val got = Similarity.hardNegatives(df, queries, 5, 8, 40)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    // naive replay: brute force then drop same-label rows, re-rank
    val naive = Similarity.bruteForceTopK(df, queries, 40).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        val qLabel = (q % 4).toInt
        rows.filter { case (_, c, _) => (c % 4).toInt != qLabel }
          .sortBy { case (_, c, cos) => (-cos, c) }.take(5).zipWithIndex
          .map { case ((_, c, cos), i) => (q, i + 1, c, (c % 4).toInt, cos) }
      }.sortBy(x => (x._1, x._2))
    assert(got == naive)
    // every mined negative really carries a different label
    assert(got.forall { case (q, _, _, l, _) => l != (q % 4).toInt })
  }

  test("hardNegatives pre-filters: full k even when projected neighbors share the label") {
    // anchor's own cluster (same label) dominates similarity; a
    // post-filtered shortlist of 3 would return nothing cross-label
    val vecs =
      (0L until 10L).map(i => (i, 0, Seq.tabulate(8)(d => if (d < 4) 5.0f else 0.1f))) ++
      (10L until 14L).map(i => (i, 1, Seq.tabulate(8)(d => if (d < 4) 0.1f else 5.0f)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(df, df.filter($"vec_id" === 0L),
      4, 4, 3)
    // shortlist 3 < same-label cluster size, yet all 3 survivors are
    // cross-label (capped by the shortlist, never empty)
    val rows = got.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getInt(3) == 1))
  }

  test("prototypicality ranks centroid-nearest first and flags ceil(frac*n)") {
    // cluster 0 seed = id 0 at the origin-ish; cluster 1 seed = id 1
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.6f, 0.4f)),
      (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.4f, 0.6f)), (6L, Seq(0.2f, 0.8f)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.prototypicality(df, 2, 0.5)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))
    // ids 0,2,3 go to cluster 0; 1,4,5,6 to cluster 1 (nearest seed)
    assert(rows.map(_._2).toSeq == Seq(0, 1, 0, 0, 1, 1, 1))
    // seeds are their own centroids: cos 1, rank 1, flagged
    assert(rows(0)._3 == 1.0 && rows(0)._4 == 1 && rows(0)._6 == 1)
    assert(rows(1)._3 == 1.0 && rows(1)._4 == 1 && rows(1)._6 == 1)
    // cluster sizes 3 and 4 → ceil(0.5*n) = 2 flagged in each
    assert(rows.count(r => r._2 == 0 && r._6 == 1) == 2)
    assert(rows.count(r => r._2 == 1 && r._6 == 1) == 2)
    // within a cluster, rank order follows cosine-to-centroid descending
    val c1 = rows.filter(_._2 == 1).sortBy(_._4)
    assert(c1.map(_._3).toSeq == c1.map(_._3).sortBy(-(_: Double)).toSeq)
  }

  // ---- containmentPairs --------------------------------------------------

  test("containmentPairs finds the near-superset MinHash-Jaccard misses") {
    val extra = (1 to 16).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, s"a b c d e f $extra"),
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    // doc 1 (4 shingles) is wholly inside doc 2 (20 shingles)
    assert(got == Seq((1L, 2L, 4L, 20L, 4L, 1.0, 0.2)))
    // the same pair's Jaccard is 0.2 — invisible to the 0.3 LSH gate
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id", minJaccard = 0.3)
      .collect()
    assert(!lsh.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("containmentPairs with sampleK >= all shingles == exhaustive all-pairs") {
    val rnd = new scala.util.Random(3)
    // overlapping windows of one shared token stream: containment-rich
    val base = (0 until 40).map(i => s"w$i")
    val docs = (1L to 12L).map { i =>
      val start = rnd.nextInt(30)
      val len = 6 + rnd.nextInt(12)
      (i, base.slice(start, (start + len) min base.size).mkString(" "))
    }.toDF("doc_id", "text")
    def collect(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    val sampled = collect(
      Dedup.containmentPairs(docs, "text", "doc_id", 0.3, sampleK = 1000))
    // exhaustive reference: every pair through the exact verify
    val sh = docs.select($"doc_id",
      TextAnalysis.hashedShingles("text").as("sh"))
    val naive = sh.as("a").join(sh.as("b"),
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        graft.functions.SetSimilarity.sortedIntersectSize(
          $"a.sh", $"b.sh").cast("long").as("inter"),
        size($"a.sh").cast("double").as("na"),
        size($"b.sh").cast("double").as("nb"))
      .filter(greatest($"inter" / $"na", $"inter" / $"nb") >= 0.3)
    val want = collect(naive.select($"id_a", $"id_b", lit(0L).as("p"),
      lit(0L).as("q"), $"inter"))
    assert(sampled == want && sampled.nonEmpty)
  }

  test("containmentPairs survives a hot-posting cap (pair found via other samples)") {
    // 'h h h' is a boilerplate shingle shared by every doc; cap drops it
    val docs = Seq(
      (1L, "h h h a b c d e"),
      (2L, "h h h a b c d e z1 z2 z3 z4 z5 z6 z7 z8"),
      (3L, "h h h p q r s"),
      (4L, "h h h m n o k")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", 0.6,
        maxPosting = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.contains((1L, 2L)))
  }

  test("NULL/zero/empty edges degrade, never crash or fabricate values") {
    // mmrTopK: a zero corpus vector is excluded, not an encoder fault
    val docs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrTopK(docs, docs.filter($"vec_id" === 0L),
      3, 0.7, 5)
    assert(mmr.collect().map(_.getLong(2)).toSet == Set(1L))
    // temperatureMixture: empty frame → empty result; NULL source drops
    val empty = Seq.empty[(Long, String)].toDF("id", "src")
    assert(Sampling.temperatureMixture(empty, "src", 0.5, 1.0, "id")
      .count() == 0)
    val withNull = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "src")
    assert(Sampling.temperatureMixture(withNull, "src", 0.5, 5.0, "id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // winsorize: a NULL measurement stays NULL (never the lower cut)
    val wdf = Seq(("k", 1L, Some(1.0)), ("k", 2L, Some(2.0)),
      ("k", 3L, None: Option[Double])).toDF("k", "id", "v")
    assert(Outliers.winsorize(wdf, "k", "v").orderBy("id")
      .collect()(2).isNullAt(3))
    // ecdf/discretize: NULL-score rows survive with NULL outputs and are
    // excluded from the percentile total
    val edf = Seq((1L, Some(1.0)), (2L, Some(2.0)),
      (3L, None: Option[Double])).toDF("id", "s")
    val e = Eval.ecdf(edf, "s").orderBy("id").collect()
    assert(e.length == 3 && e(2).isNullAt(2) && e(0).getDouble(2) == 0.25)
    val d = Outliers.discretize(edf, "s", 2).orderBy("id").collect()
    assert(d.length == 3 && d(2).isNullAt(2))
  }

  // ---- layout invariance (the distributed failure mode) -------------------

  test("new ops are invariant under repartition (layout-independence)") {
    val rnd = new scala.util.Random(29)
    val base = (0 until 40).map(i => s"w$i")
    val docs = (1L to 40L).map { i =>
      val st = rnd.nextInt(28)
      (i, if (i % 7 == 0) "en" else "de",
        base.slice(st, st + 8 + rnd.nextInt(6)).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val shuffled = docs.repartition(7)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(TextAnalysis.pmiCollocations(docs, "text", 2L)) ==
      rows(TextAnalysis.pmiCollocations(shuffled, "text", 2L)))
    assert(rows(TextAnalysis.nbMulticlass(docs, "doc_id", "text", "lang")) ==
      rows(TextAnalysis.nbMulticlass(shuffled, "doc_id", "text", "lang")))
    assert(rows(Dedup.containmentPairs(docs, "text", "doc_id", 0.3)) ==
      rows(Dedup.containmentPairs(shuffled, "text", "doc_id", 0.3)))
    assert(rows(graft.pipeline.CorpusCuration.decontaminatedSplit(
        docs, "text", "doc_id", 0.5, 0.5, "s2")) ==
      rows(graft.pipeline.CorpusCuration.decontaminatedSplit(
        shuffled, "text", "doc_id", 0.5, 0.5, "s2")))
    val emb = (0L until 30L).map(i =>
      (i, (i % 3).toInt, Seq.tabulate(8)(d => (i * 7 % 11 + d).toFloat)))
      .toDF("vec_id", "label", "embedding")
    val sEmb = emb.repartition(5)
    val q = emb.filter($"vec_id" < 2)
    assert(rows(Similarity.mmrTopK(emb, q, 4, 0.6, 10)) ==
      rows(Similarity.mmrTopK(sEmb, q, 4, 0.6, 10)))
    assert(rows(Eval.ecdf(docs.select($"doc_id",
        (($"doc_id" % 5).cast("double")).as("s")), "s")) ==
      rows(Eval.ecdf(shuffled.select($"doc_id",
        (($"doc_id" % 5).cast("double")).as("s")), "s")))
  }

  // ---- decontaminatedSplit -----------------------------------------------

  test("decontaminatedSplit == hashSplit + cross-LSH anti-join; test side intact") {
    val rnd = new scala.util.Random(17)
    val base = (0 until 50).map(i => s"w$i")
    val docs = (1L to 60L).map { i =>
      val start = rnd.nextInt(35)
      (i, base.slice(start, start + 10 + rnd.nextInt(5)).mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.pipeline.CorpusCuration.decontaminatedSplit(
        docs, "text", "doc_id", 0.5, 0.5, "s1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // replay from the same components
    val split = Sampling.hashSplit(docs, "doc_id", Seq(0.5, 0.5), "s1")
    val train = split.filter($"split" === 0)
    val test = split.filter($"split" === 1)
    val leaky = Dedup.minhashLshCross(train, test, "text", "doc_id",
        minJaccard = 0.5)
      .select("id_new").as[Long].collect().toSet
    val want =
      train.select("doc_id").as[Long].collect().filterNot(leaky).toSet
        .map((id: Long) => (id, "train")) ++
      test.select("doc_id").as[Long].collect().toSet
        .map((id: Long) => (id, "test"))
    assert(got == want && leaky.nonEmpty)
    // test side survives untouched
    assert(got.count(_._2 == "test") == test.count())
  }

  test("decontaminatedSplit: an all-duplicate corpus empties the train side") {
    val docs = (1L to 40L)
      .map(i => (i, "the very same page text repeated everywhere"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.CorpusCuration.decontaminatedSplit(
        docs, "text", "doc_id", 0.5, 0.9, "dup")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.nonEmpty && got.forall(_._2 == "test"),
      s"every train doc duplicates a test doc, got ${got.toSeq.sortBy(_._1)}")
  }

  // ---- plan-shape pins for the new narrow ops ----------------------------

  test("temperatureMixture plans as a shuffle-free narrow filter") {
    val df = (1L to 50L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val plan = Sampling.temperatureMixture(df, "src", 0.5, 2.0, "id", "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"temperatureMixture must not shuffle:\n$plan")
  }

  test("prototypicality shares ONE keyed exchange between rank and size windows") {
    val df = (0L until 20L).map(i =>
      (i, Seq.tabulate(4)(d => (i + d).toFloat))).toDF("vec_id", "embedding")
    val plan = Similarity.prototypicality(df, 2, 0.25)
      .queryExecution.executedPlan.toString
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(keyed == 1, s"expected 1 keyed exchange, got $keyed:\n$plan")
  }

  test("prCurve's only keyed shuffle is the per-score aggregate") {
    val df = (1L to 100L).map(i => (i * 0.01, (i % 2).toInt))
      .toDF("score", "label")
    // guard OFF so the audit sees the op's own lazy plan; with the
    // default-on exact gate the per-score collapse runs inside the gate's
    // pin job and the result plan just reads the materialized table
    spark.conf.set(graft.util.GridGuard.EnabledConf, "false")
    try {
      val plan = Eval.prCurve(df, "score", "label")
        .queryExecution.executedPlan.toString
      val keyed = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(keyed == 1,
        s"the corpus must collapse per-score before the sweep, got $keyed keyed exchanges:\n$plan")
    } finally spark.conf.unset(graft.util.GridGuard.EnabledConf)
    val gated = Eval.prCurve(df, "score", "label")
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findAllIn(gated).hasNext,
      s"gated prCurve must read the pinned per-score table, not re-shuffle:\n$gated")
  }

  // ---- Eval: prCurve / aucRoc --------------------------------------------

  test("prCurve replays the hand-computed threshold sweep") {
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0), (0.3, 1))
      .toDF("score", "label")
    val got = Eval.prCurve(df, "score", "label")
      .orderBy($"threshold".desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (0.9, 1L, 0L, 1.0, 1.0 / 3.0),
      (0.8, 2L, 1L, 2.0 / 3.0, 2.0 / 3.0),
      (0.5, 2L, 2L, 2.0 / 4.0, 2.0 / 3.0),
      (0.3, 3L, 2L, 3.0 / 5.0, 3.0 / 3.0)))
  }

  test("aucRoc is the exact Mann-Whitney statistic with half-credit ties") {
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0), (0.3, 1))
      .toDF("score", "label")
    val r = Eval.aucRoc(df, "score", "label").collect()(0)
    // pairs: 5 wins + 1 tie (0.8 vs 0.8) of 6 → (5 + 0.5)/6... counted:
    // wins 3.5 of 6 comparisons (see ranks: 1 + 3.5 + 5 = 9.5)
    assert(r.getDouble(0) == 3.5 / 6.0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    // perfect separation → exactly 1; all-tied scores → exactly 0.5
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("score", "label")
    assert(Eval.aucRoc(perfect, "score", "label").collect()(0).getDouble(0) == 1.0)
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("score", "label")
    assert(Eval.aucRoc(tied, "score", "label").collect()(0).getDouble(0) == 0.5)
  }

  // ---- winsorize / ecdf --------------------------------------------------

  test("winsorize clamps into the per-key interpolated percentile band") {
    val df = ((1 to 20).map(v => ("a", v.toLong, v.toDouble)) :+
      ("b", 100L, 1000.0)).toDF("k", "id", "v")
    val got = Outliers.winsorize(df, "k", "v", 0.05, 0.95)
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toMap
    // key a, values 1..20: p05 ≈ 1.95, p95 ≈ 19.05 (type-7 interpolation;
    // exact bit layout is the engine's formula — assert to 1e-12)
    assert(math.abs(got(1L) - 1.95) < 1e-12 && got(2L) == 2.0)
    assert(math.abs(got(20L) - 19.05) < 1e-12 && got(19L) == 19.0)
    assert(got(10L) == 10.0)
    // a single-value key clamps to itself
    assert(got(100L) == 1000.0)
  }

  test("classMetrics: hand-computed P/R/F1; never-predicted class gets NULLs") {
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"))
      .toDF("label", "pred")
    val rows = Eval.classMetrics(df, "label", "pred")
      .orderBy("cls").collect()
    def m(i: Int) = (rows(i).getString(0), rows(i).getLong(1),
      rows(i).getLong(2), rows(i).getLong(3))
    assert(m(0) == ("a", 2L, 2L, 1L) && rows(0).getDouble(4) == 0.5 &&
      rows(0).getDouble(5) == 0.5 && rows(0).getDouble(6) == 0.5)
    assert(m(1) == ("b", 2L, 3L, 2L) && rows(1).getDouble(5) == 1.0 &&
      rows(1).getDouble(6) == 0.8)
    assert(m(2) == ("c", 1L, 0L, 0L) && rows(2).isNullAt(4) &&
      rows(2).getDouble(5) == 0.0 && rows(2).isNullAt(6))
  }

  test("cohenKappa replays the chance-corrected agreement exactly") {
    val df = Seq((1, 1), (1, 0), (0, 0), (0, 0)).toDF("a", "b")
    val r = Eval.cohenKappa(df, "a", "b").collect()(0)
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.75 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    // perfect agreement → kappa 1; independence-shaped table → kappa 0
    val perfect = Seq((1, 1), (0, 0)).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, "a", "b").collect()(0).getDouble(3) == 1.0)
    val indep = Seq((1, 1), (1, 0), (0, 1), (0, 0)).toDF("a", "b")
    assert(Eval.cohenKappa(indep, "a", "b").collect()(0).getDouble(3) == 0.0)
  }

  test("calibrationBins: sigmoid deciles, exact pos_rate, top-bin clamp") {
    // logit 0 → p=0.5 (bin 5); big positive logits clamp into bin 9
    val df = Seq((0.0, 1), (0.0, 0), (100.0, 1), (100.0, 1), (-100.0, 0))
      .toDF("score", "label")
    val rows = Eval.calibrationBins(df, "score", "label")
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0, 1L, 0.0, 0.0),        // p≈0 → bin 0, no positives
      (5, 2L, 0.5, 0.5),        // the two logit-0 rows, one positive
      (9, 2L, 1.0, 1.0)))       // p≈1 clamps to bin 9 (not bin 10)
  }

  test("aucRocBy slices == global aucRoc per slice; one-class slices NULL") {
    val df = Seq(("x", 0.9, 1), ("x", 0.8, 0), ("x", 0.5, 1),
      ("y", 0.7, 1), ("y", 0.6, 0), ("z", 0.5, 1), ("z", 0.4, 1))
      .toDF("g", "score", "label")
    val by = Eval.aucRocBy(df, "g", "score", "label").orderBy("g").collect()
    val gx = Eval.aucRoc(df.filter($"g" === "x"), "score", "label")
      .collect()(0).getDouble(0)
    val gy = Eval.aucRoc(df.filter($"g" === "y"), "score", "label")
      .collect()(0).getDouble(0)
    assert(by(0).getDouble(1) == gx && by(1).getDouble(1) == gy)
    assert(by(2).isNullAt(1)) // z has no negatives → undefined, not 0.5
  }

  test("aucRoc is invariant under the ecdf transform (monotone, tie-preserving)") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 200).map(_ =>
      (math.floor(rnd.nextDouble() * 20) / 20.0, rnd.nextInt(2)))
      .toDF("score", "label")
    val raw = Eval.aucRoc(df, "score", "label").collect()(0).getDouble(0)
    val viaEcdf = Eval.aucRoc(
      Eval.ecdf(df, "score"), "pct", "label").collect()(0).getDouble(0)
    assert(raw == viaEcdf) // exact: identical rank structure
  }

  test("blend == the weighted left-assoc sum of each signal's ecdf rank") {
    val df = Seq((1L, 1.0, 10.0), (2L, 2.0, 5.0), (3L, 3.0, 5.0))
      .toDF("id", "a", "b")
    val got = Eval.blend(df, Seq("a" -> 0.7, "b" -> 0.3))
      .orderBy("id").collect().map(_.getDouble(3)).toSeq
    // a ranks: 0.5/3, 1.5/3, 2.5/3; b: 10 → 2.5/3, the tied 5s → 1/3
    val want = Seq(
      0.7 * (0.5 / 3.0) + 0.3 * (2.5 / 3.0),
      0.7 * (1.5 / 3.0) + 0.3 * (1.0 / 3.0),
      0.7 * (2.5 / 3.0) + 0.3 * (1.0 / 3.0))
    assert(got == want)
  }

  test("robustScale: modified z for all rows, NULL for zero-MAD keys") {
    val df = ((1 to 9).map(v => ("a", v.toLong, v.toDouble)) ++
      Seq(("b", 10L, 5.0), ("b", 11L, 5.0))).toDF("k", "id", "v")
    val got = Outliers.robustScale(df, "k", "id", "v")
      .orderBy("id").collect()
    // key a: median 5, MAD 2 → mz(1) = 0.6745*(1-5)/2
    assert(got(0).getDouble(3) == 0.6745 * (1.0 - 5.0) / 2.0)
    assert(got(4).getDouble(3) == 0.0) // the median itself
    // constant key b: MAD 0 → NULL, not 0
    assert(got(9).isNullAt(3) && got(10).isNullAt(3))
  }

  test("discretize: equal-frequency bins; a tie-group lands in ONE bin") {
    val df = (1 to 8).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    val got = Outliers.discretize(df, "v", 4)
      .orderBy("id").collect().map(_.getInt(2)).toSeq
    assert(got == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // heavy ties: every copy of the duplicated value gets the same bin
    val tied = ((1 to 12).map(i => (i.toLong, 5.0)) ++
      Seq((13L, 1.0), (14L, 9.0))).toDF("id", "v")
    val bins = Outliers.discretize(tied, "v", 4)
      .filter($"v" === 5.0).select("bin").distinct().collect()
    assert(bins.length == 1)
  }

  test("ecdf assigns mid-rank percentiles, ties share the midpoint") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 3.0))
      .toDF("id", "score")
    val got = Eval.ecdf(df, "score").orderBy("id").collect()
      .map(r => r.getDouble(2)).toSeq
    assert(got == Seq(0.5 / 4.0, 2.0 / 4.0, 2.0 / 4.0, 3.5 / 4.0))
  }

  // ---- nbMulticlass ------------------------------------------------------

  test("nbMulticlass replays the k-way NB formula; empty docs tie to the first class") {
    val df = Seq(
      (1L, "a", "aa aa"), (2L, "a", "aa bb"),
      (3L, "b", "cc cc"), (4L, "b", "")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.nbMulticlass(df, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // hand replay: T_a=4 (aa x3, bb x1), T_b=2 (cc x2), V=3, priors 2/4
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sA1 = r6(math.log(2.0 / 4.0) + (math.log(4.0) + math.log(4.0)) -
      2.0 * math.log(7.0)) // doc1 under class a
    assert(got(0) == (1L, 2L, "a", sA1))
    assert(got(1)._3 == "a" && got(2)._3 == "b")
    // doc 4 is empty: score = prior for both classes (equal) → 'a' wins
    assert(got(3) == (4L, 0L, "a", r6(math.log(2.0 / 4.0))))
  }

  // ---- temperatureMixture ------------------------------------------------

  test("temperatureMixture replays the per-source bucket cut exactly") {
    val df = (1L to 300L).map(i => (i, if (i <= 240) "big" else "small"))
      .toDF("id", "src")
    val got = Sampling.temperatureMixture(df, "src", 0.5, 3.0, "id", "t")
      .select("id").as[Long].collect().toSet
    val rates = Map(
      "big" -> math.min(3.0 * (1.0 / math.sqrt(240.0)), 1.0),
      "small" -> math.min(3.0 * (1.0 / math.sqrt(60.0)), 1.0))
    val want = df.select($"id", $"src",
        Sampling.hashBucket($"id", "t").as("b")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter { case (_, src, b) =>
        b < (rates(src) * Sampling.Space.toDouble).toLong }
      .map(_._1).toSet
    assert(got == want && got.nonEmpty)
    // tau < 1 up-weights the small source's retention FRACTION
    val fSmall = want.count(_ > 240L).toDouble / 60.0
    val fBig = want.count(_ <= 240L).toDouble / 240.0
    assert(fSmall > fBig, s"small $fSmall should exceed big $fBig")
  }

  test("temperatureMixture: tau=1 is a flat rate, k is monotone") {
    val df = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    // tau = 1: rate = k for every source == hashFraction at the same salt
    val flat = Sampling.temperatureMixture(df, "src", 1.0, 0.3, "id", "m")
      .select("id").as[Long].collect().toSet
    val frac = Sampling.hashFraction(df, "id", 0.3, "m")
      .select("id").as[Long].collect().toSet
    assert(flat == frac)
    val k2 = Sampling.temperatureMixture(df, "src", 0.5, 0.6, "id", "m")
      .select("id").as[Long].collect().toSet
    val k1 = Sampling.temperatureMixture(df, "src", 0.5, 0.3, "id", "m")
      .select("id").as[Long].collect().toSet
    assert(k1.subsetOf(k2), "raising k must only add documents")
  }

  // ---- mmrTopK -----------------------------------------------------------

  test("mmrTopK with lambda=1 reduces to pure-relevance ranking") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 30L).map { i =>
      (i, Seq.tabulate(12)(_ => rnd.nextFloat() - 0.3f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 2)
    val mmr = Similarity.mmrTopK(df, queries, 5, 1.0, 20)
      .orderBy("query_id", "mmr_rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val brute = Similarity.bruteForceTopK(df, queries, 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(mmr == brute)
  }

  test("mmrTopK diversifies: second pick escapes the near-duplicate cluster") {
    // cluster X: three near-identical highly relevant vectors; cluster Y:
    // one slightly less relevant but orthogonal-ish vector
    val docs = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),            // the query
      (1L, Seq(0.99f, 0.10f, 0.00f)),           // X
      (2L, Seq(0.99f, 0.11f, 0.00f)),           // X (near-dup of 1)
      (3L, Seq(0.98f, 0.12f, 0.00f)),           // X (near-dup of 1)
      (4L, Seq(0.80f, 0.00f, 0.60f)))           // Y (distinct direction)
      .toDF("vec_id", "embedding")
    val queries = docs.filter($"vec_id" === 100L)
    val relOrder = Similarity.mmrTopK(docs, queries, 3, 1.0, 4)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(relOrder == Seq(1L, 2L, 3L)) // pure relevance: all from X
    val diverse = Similarity.mmrTopK(docs, queries, 3, 0.5, 4)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(diverse.head == 1L)          // most relevant still first
    assert(diverse(1) == 4L, s"second pick should diversify, got $diverse")
  }

  test("mmrTopK caps at the candidate-set size") {
    val docs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(docs, docs.filter($"vec_id" === 0L),
      10, 0.7, 2)
    assert(got.count() == 2)
  }

  test("bm25 replays the scoring formula; docs without query terms excluded") {
    val df = Seq((1L, "hash join"), (2L, "hash hash hash scan scan scan"),
      (3L, "other words entirely")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", "hash join")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val (k1, b) = (1.2, 0.75)
    val n = 3.0; val avgdl = (2.0 + 6.0 + 3.0) / 3.0
    def idf(dfq: Double) = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
    def term(tf: Double, dfq: Double, dl: Double) =
      idf(dfq) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L)) // doc 3 matches nothing
    assert(got(1L) == r6(term(1, 2, 2) + term(1, 1, 2)))
    assert(got(2L) == r6(term(3, 2, 6)))
    // the short doc holding the RARE term outranks the tf-stuffed one
    assert(got(1L) > got(2L))
  }

  // ---- pmiCollocations / transitionMatrix --------------------------------

  test("pmiCollocations replays the exact probability-ratio formula") {
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "york new"),
      (3L, "new")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // unigrams: new=4, york=3, T1=7; bigrams: (new,york)=2, (york,new)=2, T2=4
    def pmi(c12: Long, c1: Long, c2: Long) =
      BigDecimal(math.log((c12.toDouble * 7.0 * 7.0) /
        (4.0 * c1.toDouble * c2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("new", "york", 2L, 4L, 3L, pmi(2, 4, 3)),
      ("york", "new", 2L, 3L, 4L, pmi(2, 3, 4))))
  }

  test("pmiCollocations: minCount prunes, single-token docs count as unigrams only") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d"), (4L, "e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L))) // (c,d) has c12=1 → pruned
  }

  test("aHash replays the analytic raster; hammingNearDups pairs by distance") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val media = Multimodal.synthesizeImages(docs, "doc_id")
    val got = Multimodal.aHash(media).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def expected(id: Long): Long = {
      val w = id % 13 + 3; val h = id % 7 + 2
      val ps = (0 until 60).map { k =>
        (id * 31 + ((k % 10) * w / 10) * 7 + ((k / 10) * h / 6) * 13) % 256 }
      val tot = ps.sum
      ps.zipWithIndex.foldLeft(0L) { case (acc, (p, k)) =>
        if (p * 60 > tot) acc | (1L << k) else acc }
    }
    assert(got == Seq(1L, 2L, 3L).map(i => (i, expected(i))))
    // generalized pigeonhole banding over hand sketches
    val sk = Seq((1L, 0L), (2L, 3L), (3L, 7L), (4L, 0xF0F0F0L))
      .toDF("id", "sk")
    val pairs = Dedup.hammingNearDups(sk, "sk", "id", 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // d(1,2)=2 and d(2,3)=1 pass; d(1,3)=3 is a candidate (two chunks
    // agree) but the exact verify rejects it; 4 is far from everything
    assert(pairs == Set((1L, 2L), (2L, 3L)))
  }

  test("hammingDedupSurvivors: near-dups drop, degenerate chunks can't mass-delete") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val base = (0xAAAAAL << 40) | (0xBBBBBL << 20) | 0xCCCCCL
    val rows = Seq(
      (1L, ts(10), base),        // canonical
      (2L, ts(20), base ^ 3L),   // 2 flips in chunk 0 → loses chunks 1,2
      (3L, ts(30), (0x11111L << 40) | (0x22222L << 20) | 0x33333L),
      // 4 and 5 are NOT near-dups (hamming 3) but share all-zero high
      // chunks — the degenerate-chunk guard must keep BOTH (the old
      // chunk-value key would have falsely deleted 5)
      (4L, ts(40), 0L), (5L, ts(50), 7L)
    ).toDF("id", "ts", "ahash")
    val got = Dedup.hammingDedupSurvivors(rows, "ahash", "id",
        windowDur = "10 minutes", maxHamming = 2)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 3L, 4L, 5L))
  }

  test("hammingDedupSurvivors: degenerate full-sketch keys can't collide with ordinary chunk values") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // maxHamming=1 → two 30-bit chunks. X's high chunk is all-zero, so its
    // degenerate key is the full sketch 5 — numerically equal to Y's
    // ORDINARY high-chunk value 5. Hamming(X, Y) = 4, far from dup; an
    // untagged key space would bucket them together at chunk 1 and
    // falsely delete Y.
    val x = 5L
    val y = (5L << 30) | 9L
    val rows = Seq((1L, ts(10), x), (2L, ts(20), y)).toDF("id", "ts", "ahash")
    val got = Dedup.hammingDedupSurvivors(rows, "ahash", "id",
        windowDur = "10 minutes", maxHamming = 1)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L))
  }

  test("eval guards: degenerate inputs yield NULL, not an ANSI fault") {
    // all-negative corpus → recall undefined on every prCurve row
    val neg = Seq((0.9, 0), (0.5, 0)).toDF("score", "label")
    val pr = Eval.prCurve(neg, "score", "label").collect()
    assert(pr.forall(_.isNullAt(4)) && pr.forall(!_.isNullAt(3)))
    // single-class corpus → AUC undefined
    val auc = Eval.aucRoc(neg, "score", "label").collect()(0)
    assert(auc.isNullAt(0) && auc.getLong(1) == 0L && auc.getLong(2) == 2L)
    // constant, agreeing raters → p_e = 1 → kappa undefined
    val const = Seq((1, 1), (1, 1)).toDF("a", "b")
    val k = Eval.cohenKappa(const, "a", "b").collect()(0)
    assert(k.getDouble(2) == 1.0 && k.isNullAt(3))
  }

  test("blendKeyed == blend bit-for-bit, including NULL-signal rows") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 100L).map { i =>
      (i,
        if (i % 17 == 0) None else Some(math.floor(rnd.nextDouble() * 10) / 10.0),
        Some(math.floor(rnd.nextDouble() * 5) / 5.0),
        Some(rnd.nextInt(3).toDouble))
    }.toDF("id", "a", "b", "c")
    val ws = Seq("a" -> 0.5, "b" -> 0.2, "c" -> 0.3)
    def m(d: org.apache.spark.sql.DataFrame) = d
      .select("id", "a", "b", "c", "blended").collect()
      .map(r => r.getLong(0) ->
        (0 to 3).map(i => if (r.isNullAt(i + 1)) null
          else r.getDouble(i + 1)).toSeq).toMap
    assert(m(Eval.blendKeyed(df, "id", ws)) == m(Eval.blend(df, ws)))
    // the shared-scan plan carries ONE corpus-keyed aggregate over the
    // exploded signals plus the pivot — not one aggregate per signal
    val plan = Eval.blendKeyed(df, "id", ws)
      .queryExecution.optimizedPlan.toString
    assert("Generate explode".r.findAllIn(plan).size <= 1)
  }

  test("blend keeps rows with a NULL signal (NULL blended), matching ecdf") {
    val df = Seq((1L, Some(1.0), Some(10.0)), (2L, None, Some(5.0)),
      (3L, Some(3.0), Some(5.0)))
      .toDF("id", "a", "b")
    val got = Eval.blend(df, Seq("a" -> 0.7, "b" -> 0.3))
      .orderBy("id").collect()
    assert(got.length == 3)            // row 2 survives
    assert(got(1).isNullAt(3))         // with NULL blended
    assert(!got(0).isNullAt(3) && !got(2).isNullAt(3))
    // non-NULL ranks exclude the NULL row from N: a's table is over 2 rows
    assert(got(0).getDouble(3) == 0.7 * (0.5 / 2.0) + 0.3 * (2.5 / 3.0))
  }

  test("kaplanMeier: hand-computed curve, censoring, terminal-death pin") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "purchase"),
      (3L, ts(0), 2L, "view"), (4L, ts(20), 2L, "view"),   // censored @20
      (5L, ts(0), 3L, "purchase"),                          // converts @0
      (6L, ts(0), 4L, "view"), (7L, ts(10), 4L, "click"))   // censored @10
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventStream.kaplanMeier(events, "purchase")
      .orderBy("dur").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 4L, 1L, 0L, 0.75),   // S = 1 - 1/4
      (10L, 3L, 1L, 1L, 0.5),   // S = 0.75 * (1 - 1/3)
      (20L, 1L, 0L, 1L, 0.5)))  // censoring alone never moves S
    // every remaining user converting at once pins survival to exact 0
    val all = Seq((1L, ts(0), 1L, "view"), (2L, ts(5), 1L, "purchase"),
      (3L, ts(0), 2L, "view"), (4L, ts(5), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val last = graft.streaming.EventStream.kaplanMeier(all, "purchase")
      .orderBy("dur").collect()
    assert(last.length == 1 && last(0).getDouble(4) == 0.0)
  }

  test("transitionMatrix counts adjacencies per user with id tie-break") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      (1L, ts(10), 1L, "A"), (2L, ts(20), 1L, "B"), (3L, ts(30), 1L, "A"),
      // user 2: equal timestamps — event_id orders B(4) before B(5)
      (4L, ts(10), 2L, "B"), (5L, ts(10), 2L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventStream.transitionMatrix(events)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      ("A", "B", 1L, 1L, 1.0),
      ("B", "A", 1L, 2L, 0.5),
      ("B", "B", 1L, 2L, 0.5)))
    // no cross-user adjacency: user 1's last event never chains to user 2
  }

  test("prototypicality ranks zero vectors last (NULL cosine sentinel)") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    // k=1: everything lands in cluster 0 (seed id 0)
    val rows = Similarity.prototypicality(df, 1, 0.25)
      .orderBy("rnk").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L, 1L))
    assert(rows(2).isNullAt(2)) // the zero vector's cosine is NULL
    // ceil(0.25*3) = 1 → only the seed is flagged
    assert(rows.map(_.getInt(5)).toSeq == Seq(1, 0, 0))
  }
}

package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

class TextAnalysisSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  test("tokenCount handles blanks and runs of whitespace") {
    val df = Seq("a b  c", "", "   ", "one").toDF("text")
    val got = df.select(TextAnalysis.tokenCount("text")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    val df = Seq(
      "the cat and the dog of it",
      "der hund und die katze ist",
      "xyzzy qwerty").toDF("text")
    val got = df.select(TextAnalysis.langId("text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("normalize: lowercase, punct runs to one space, trimmed") {
    val df = Seq("  Hello,\tWorld!!  ", "already clean", "", "a--b__c")
      .toDF("text")
    val got = df.select(TextAnalysis.normalize("text")).as[String].collect().toSeq
    assert(got == Seq("hello world", "already clean", "", "a b c"))
  }

  test("fingerprint is stable and discriminates different texts") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps",
      "a completely different sentence").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint("text")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("tfidf ranks document-specific terms above corpus-wide ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common yak yak"),
      (3L, "common xenon")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // 'common' appears in every doc → low idf; unique terms rank first
    assert(out.contains((1L, 1, "zebra")))
    assert(out.contains((2L, 1, "yak")))
    assert(out.contains((3L, 1, "xenon")))
  }

  test("tfidf: no mandatory broadcast of the vocabulary side; minDf prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common yak yak"),
      (3L, "common xenon")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
    // the document-frequency aggregate is vocabulary-sized at corpus scale:
    // the join must carry NO broadcast hint (AQE decides at runtime)
    val logical = out.queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("broadcast"), logical.take(800))
    // minDf = 2 drops every term that appears in a single document; only
    // the corpus-wide 'common' survives the vocabulary prune
    val pruned = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2, minDf = 2L)
      .select("term").distinct().as[String].collect().toSet
    assert(pruned == Set("common"))
  }

  test("qualityScore rewards clean english text") {
    val df = Seq(
      "the cat and the dog walked to the park and it was sunny in the town",
      "@@@@ #### !!!! %%%%").toDF("text")
    val s = df.select(TextAnalysis.qualityScore("text")).as[Double].collect()
    assert(s(0) > 0.7 && s(1) < 0.5)
  }

  test("gopher signals: analytic values on handcrafted docs") {
    val df = Seq(
      (1L, "aa bbb cccc"),          // 9 alnum chars / 3 toks = 3.0
      (2L, "x! y? z."),             // 3 symbols / 3 words = 1.0
      (3L, "a b 1 2"),              // 2 letter-words / 4 = 0.5
      (4L, "w w w w w"),            // 3-grams: 3 total, 1 distinct -> 2/3
      (5L, "")                      // all signals 0 on empty
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.meanWordLength(col("text")).as("mw"),
        TextAnalysis.symbolWordRatio(col("text")).as("sr"),
        TextAnalysis.alphaWordFraction(col("text")).as("af"),
        TextAnalysis.dupShingleFraction(col("text")).as("df"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L)._1 == 3.0)
    assert(got(2L)._2 == 1.0)
    assert(got(3L)._3 == 0.5)
    assert(math.abs(got(4L)._4 - 2.0 / 3.0) < 1e-12)
    assert(got(5L) == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("packSequences: per-shard offsets, boundary-spanning docs, zero-token drop") {
    val docs = Seq(
      (0L, "a", (1 to 6).map(_ => "w").mkString(" ")),  // 6 toks: seqs 0
      (1L, "a", (1 to 3).map(_ => "w").mkString(" ")),  // start 6, spans 0..1 (ctx 8)
      (2L, "a", "  "),                                  // zero tokens: dropped
      (3L, "a", (1 to 8).map(_ => "w").mkString(" ")),  // start 9, spans 1..2
      (4L, "b", (1 to 2).map(_ => "w").mkString(" "))   // fresh shard: seq 0
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.packSequences(docs, "text", "doc_id", 8)
      .orderBy("source", "seq_id", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", 0L, 0L, 0L, 6L), ("a", 0L, 1L, 6L, 3L),
      ("a", 1L, 1L, 6L, 3L), ("a", 1L, 3L, 9L, 8L),
      ("a", 2L, 3L, 9L, 8L),
      ("b", 0L, 4L, 0L, 2L)))
  }

  test("packSequences subShards>1: independent per-sub-shard packing invariants") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"src${i % 2}", (1 to i % 7 + 1).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val packed = TextAnalysis.packSequences(docs, "text", "doc_id", 8,
      subShards = 3)
    assert(packed.columns.toSeq ==
      Seq("source", "sub_shard", "seq_id", "doc_id", "start_tok", "ntok"))
    val rows = packed.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // every doc lands in exactly one (source, sub_shard)
    assert(rows.groupBy(_._4).forall { case (_, rs) =>
      rs.map(r => (r._1, r._2)).distinct.length == 1
    })
    // all 60 docs have >= 1 token, so all survive
    assert(rows.map(_._4).distinct.length == 60)
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      // within a sub-shard, start_tok is the running sum of prior ntok in
      // ascending doc_id order — a contiguous token stream
      val perDoc = rs.map(r => (r._4, r._5, r._6)).distinct.sortBy(_._1)
      var run = 0L
      perDoc.foreach { case (_, start, ntok) =>
        assert(start == run); run += ntok
      }
      // each doc emits exactly the ctx sequences it overlaps
      rs.foreach { case (_, _, seq, _, start, ntok) =>
        assert(seq >= start / 8 && seq <= (start + ntok - 1) / 8)
      }
      val byDoc = rs.groupBy(_._4)
      byDoc.foreach { case (_, drs) =>
        val (start, ntok) = (drs.head._5, drs.head._6)
        assert(drs.length == ((start + ntok - 1) / 8 - start / 8 + 1).toInt)
      }
    }
    // sub-shard union ≡ the docs of the subShards=1 packing (same ntok)
    val flat = TextAnalysis.packSequences(docs, "text", "doc_id", 8)
      .select("doc_id", "ntok").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._4, r._6)).toSet == flat)
  }

  test("dupLineFraction / dupParaFraction: blanks, singles, repeats") {
    val df = Seq(
      "a\na\nb",               // lines a,a,b → 1 − 2/3
      "a\n\n a \n\nb",         // paras a,a,b (trimmed) → 1 − 2/3; lines same
      "one line only",         // single → 0
      "", "   ", " \n \n ",    // nothing non-blank → 0
      "p\n\n\n\np"             // 2+ newline runs are ONE separator → p,p → 0.5
    ).toDF("text")
    val got = df.select(
      TextAnalysis.dupLineFraction(col("text")).as("l"),
      TextAnalysis.dupParaFraction(col("text")).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def ~=(x: Double, y: Double) = math.abs(x - y) < 1e-9
    assert(~=(got(0)._1, 1.0 - 2.0 / 3) && ~=(got(0)._2, 0.0))
    assert(~=(got(1)._1, 1.0 - 2.0 / 3) && ~=(got(1)._2, 1.0 - 2.0 / 3))
    assert(got(2) == ((0.0, 0.0)) && got(3) == ((0.0, 0.0)))
    assert(got(4) == ((0.0, 0.0)) && got(5) == ((0.0, 0.0)))
    assert(~=(got(6)._2, 0.5))
  }

  test("lmScore: add-1 bigram NLL against hand-computed counts") {
    // corpus bigrams: (a,b)×3, (b,a)×1, (b,c)×1; contexts a=3, b=2; V=3
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // p(a,b)=(3+1)/(3+3)=2/3, p(b,a)=p(b,c)=(1+1)/(2+3)=2/5
    val lnAB = math.log(2.0 / 3); val lnBX = math.log(2.0 / 5)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.length == 2) // single-token doc 3 has no bigrams
    assert(got(0) == ((1L, 3L, r6(-(2 * lnAB + lnBX) / 3))))
    assert(got(1) == ((2L, 2L, r6(-(lnAB + lnBX) / 2))))
  }

  test("bpeTrain: greedy merges, deterministic tie-breaks, early stop") {
    // counts: low*3, lower*2, newest*1 — hand-traced merge schedule:
    // r1 (l,o) 5 [ties (o,w) on count, lhs breaks], r2 (lo,w) 5,
    // r3 (e,r) 2 [ties (low,e), lhs 'e' < 'low'], r4 (low,er) 2
    val df = Seq("low low low lower lower newest").toDF("text")
    val got = TextAnalysis.bpeTrain(df, "text", 4).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L), (4L, "low", "er", 2L)))
    // single-char-word corpus has no adjacent pairs: empty table, early stop
    assert(TextAnalysis.bpeTrain(
      Seq("a b a").toDF("text"), "text", 3).count() == 0)
  }

  test("featureHash matches an independent md5 reference") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val words = Seq("foo", "bar", "foo", "baz9")
    val expected = words.map(h60)
      .groupBy(h => h % 16)
      .map { case (slot, hs) =>
        (1L, slot, hs.map(h => ((h >> 8) % 2) * 2 - 1).sum) }
      .toSeq.sortBy(_._2)
    val got = TextAnalysis.featureHash(
        Seq((1L, words.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("slot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // blank documents emit no rows
    assert(TextAnalysis.featureHash(
      Seq((2L, "  ")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }

  test("bpeSubwords: frequency-weighted vocabulary after the merge schedule") {
    // after the 4 merges above (the 4th, (low,er), fully merges 'lower'):
    // low→[low], lower→[lower], newest stays characters
    val df = Seq("low low low lower lower newest").toDF("text")
    val got = TextAnalysis.bpeSubwords(df, "text", 4).orderBy("subword")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("e", 2L), ("low", 3L), ("lower", 2L),
      ("n", 1L), ("s", 1L), ("t", 1L), ("w", 1L)))
  }

  test("bpeEncode: real token counts under the trained schedule") {
    // same corpus/schedule as the bpeTrain test — after (l,o) (lo,w) (e,r)
    // (low,er): low → 1 subword, lower → 1, newest → 6 characters (none of
    // its adjacent pairs ever win a merge round)
    val df = Seq((1L, "low low low lower lower newest"), (2L, "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(df, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 6L, 3L * 1 + 2L * 1 + 6L))) // doc 2 absent
  }

  test("dsirSelect: deterministic Gumbel top-k over the weight table") {
    val docs = Seq(
      (1L, true, "alpha beta alpha"),
      (2L, true, "alpha beta gamma"),
      (3L, false, "alpha beta alpha beta"),
      (4L, false, "delta epsilon zeta"),
      (5L, false, "alpha gamma beta")
    ).toDF("doc_id", "tgt", "text")
    val sel = TextAnalysis.dsirSelect(docs, "doc_id", "text", col("tgt"), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(sel.length == 2)
    // independent reference: dsirWeights + MessageDigest-keyed Gumbel noise
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def h60(s: String) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    def key(id: Long) = {
      val u = (h60("dsir" + id) % 1048576L + 0.5) / 1048576.0
      math.round((w(id) - math.log(-math.log(u))) * 1e6) / 1e6
    }
    val expect = w.keys.toSeq.map(id => (id, w(id), key(id)))
      .sortBy { case (id, _, k) => (-k, id) }.take(2)
    assert(sel.toSeq.sortBy(t => (-t._3, t._1)) == expect)
  }

  test("selectByTokenBudget: quality ranking, atomic prefix cut, per-source budgets") {
    val docs = Seq(
      // source a — quality-ranked: d1(0.9, 3), d2(0.8, 4), d3(0.7, 2), d4(0.6, 1)
      (1L, "a", "w w w", 0.9),
      (2L, "a", "w w w w", 0.8),
      (3L, "a", "w w", 0.7),
      (4L, "a", "w", 0.6),
      (5L, "a", "   ", 0.99),   // zero tokens → dropped despite top quality
      // source b — its own budget
      (6L, "b", "w w w w w w", 0.5),
      (7L, "b", "w w w", 0.4)
    ).toDF("doc_id", "source", "text", "q")
    val got = TextAnalysis.selectByTokenBudget(docs, "text", "doc_id",
      budget = 7L, qualityCol = Some("q"))
      .orderBy("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // a: cum 3, 7, 9, 10 → the PREFIX within budget survives; d3 would
    // cross and is dropped atomically, taking d4 with it (prefix cut,
    // not best-fit packing)
    assert(got.toSeq == Seq(
      ("a", 1L, 3L, 3L), ("a", 2L, 4L, 7L),
      ("b", 6L, 6L, 6L)))
    // default quality path runs and respects the budget bound
    val dflt = TextAnalysis.selectByTokenBudget(docs, "text", "doc_id", 5L)
    assert(dflt.collect().forall(_.getLong(4) <= 5L))
  }

  test("packSequencesStream: one batch ≡ packSequences; shard offsets " +
      "persist across checkpoint restarts") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "a", (1 to 6).map(_ => "w").mkString(" ")),
      (1L, "a", (1 to 3).map(_ => "w").mkString(" ")),
      (3L, "a", (1 to 8).map(_ => "w").mkString(" ")),
      (4L, "b", (1 to 2).map(_ => "w").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val src = java.nio.file.Files.createTempDirectory("graft_pack_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_pack_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pack_ckpt").toString
    docs.write.mode("append").parquet(src)
    def drain(): Unit = {
      val q = TextAnalysis.packSequencesStream(
        spark.readStream.schema(docs.schema).parquet(src),
        "text", "doc_id", 8)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    drain()
    def sinkRows() = spark.read.parquet(sink)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = TextAnalysis.packSequences(docs, "text", "doc_id", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(sinkRows() == batch) // one AvailableNow batch ≡ the batch op
    // late second batch: shard a's offset must CONTINUE from 6+3+8 = 17
    Seq((9L, "a", (1 to 4).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode("append").parquet(src)
    drain()
    val late = (sinkRows() -- batch).filter(_._3 == 9L)
    // 4 tokens from offset 17 span ctx sequences 2..2 (17/8=2, 20/8=2)
    assert(late == Set(("a", 2L, 9L, 17L, 4L)))
  }

  test("chunk: window/overlap semantics and edge cases") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three words"),                        // n < size
      (3L, "a b c d"),                                 // n == size
      (4L, ""), (5L, "   ")                            // blank → no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "text", "doc_id", 4, 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // stride 3: doc 1 → chunks at 0,3,6 (last takes tokens 7..10)
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 4, "w4 w5 w6 w7"),
      (1L, 2, 4, "w7 w8 w9 w10")))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "only three words")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 4, "a b c d")))
    assert(!out.exists(r => r._1 == 4L || r._1 == 5L))
    // adjacent chunks share exactly `overlap` tokens
    assert(out.filter(_._1 == 1L).sliding(2).forall {
      case Array(a, b) => a._4.split(" ").takeRight(1).sameElements(
        b._4.split(" ").take(1))
      case _ => true
    })
  }

  test("redactPii replaces and counts emails/phones") {
    val df = Seq(
      "write a@b.org or b.c@d-e.io now",
      "call 555-123-4567 or 555.987.6543",
      "clean text").toDF("text")
    val got = df.select(
      TextAnalysis.redactPii("text").as("red"),
      TextAnalysis.piiCounts("text")._1.as("ne"),
      TextAnalysis.piiCounts("text")._2.as("np"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got(0) == (("write <EMAIL> or <EMAIL> now", 2, 0)))
    assert(got(1) == (("call <PHONE> or <PHONE>", 0, 2)))
    assert(got(2) == (("clean text", 0, 0)))
  }
}

class DedupSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 5
  private lazy val docs = Seq(
    (0L, base),
    (1L, base + "with one small change"), // near-dup of 0
    (2L, "an entirely different document about spark and data processing pipelines at scale"),
    (3L, base), // exact dup of 0
    (4L, "another unrelated text body mentioning neither foxes nor dogs at all today")
  ).toDF("doc_id", "text")

  test("exact dedup finds the identical pair only") {
    val d = Dedup.exact(docs, "text", "doc_id").collect()
    assert(d.length == 1)
    assert(d(0).getLong(1) == 0L && d(0).getLong(2) == 2L)
  }

  test("minhash LSH surfaces the near-duplicate pair") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // near-dup found
    assert(pairs.contains((0L, 3L))) // exact dup found
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated not paired
  }

  test("decontaminateBroadcast equals the join-shaped decontaminate") {
    val corpus = Seq(
      (10L, "totally clean document body here"),
      (11L, base),                       // shares shingles with the bench
      (12L, "another clean and unrelated one"),
      (13L, null.asInstanceOf[String])   // NULL text survives on BOTH paths
    ).toDF("doc_id", "text")
    val bench = Seq((0L, base)).toDF("doc_id", "text")
    val viaJoin = Dedup.decontaminate(corpus, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaSet = Dedup.decontaminateBroadcast(corpus, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaJoin == Set(10L, 12L, 13L) && viaSet == viaJoin)
    // over-cap bench side falls back to the join shape, same answer
    val fallback = Dedup.decontaminateBroadcast(corpus, bench, "text",
      "doc_id", maxBenchShingles = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fallback == viaJoin)
  }

  test("dedupLines drops corpus-frequent lines, keeps order, preserves rows") {
    val docs = Seq(
      (1L, "unique one\nBOILER\nunique two"),
      (2L, "BOILER\nother text"),
      (3L, "BOILER"),          // empties entirely
      (4L, "solo\nBOILER\nsolo") // in-doc repeats count toward the corpus tally
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "text", "doc_id", maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // BOILER occurs 4x > 2 -> dropped everywhere; "solo" occurs 2x <= 2 -> kept
    assert(got == Map(
      1L -> "unique one\nunique two",
      2L -> "other text",
      3L -> "",
      4L -> "solo\nsolo"))
  }

  test("simhash: near-dups at small hamming distance, unrelated far") {
    val sk = docs.select(col("doc_id"), Dedup.simhash("text").as("s"))
    val pairs = sk.as("l").crossJoin(sk.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id"), col("r.doc_id"),
        Dedup.hamming(col("l.s"), col("r.s")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue())).toMap
    assert(pairs((0L, 3L)) == 0) // identical text, identical sketch
    assert(pairs((0L, 1L)) < 15) // near-dup: small distance
    assert(pairs((0L, 2L)) > 15) // unrelated: large distance
  }

  test("ngram jaccard pairs within a block") {
    val blocked = docs.withColumn("blk", lit("1"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "text", "doc_id", Seq("blk"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("prefix-filtered jaccard pairs equal the block cross-product exactly") {
    // larger corpus: 40 docs, shared phrases → nontrivial pair structure
    val rnd = new scala.util.Random(23)
    val phrases = Vector("the quick brown fox", "jumps over the lazy dog",
      "spark engines shuffle data", "parquet files store columns",
      "weighted quantiles need sorting")
    val corpus = (0L until 40L).map { i =>
      val body = (0 until 3 + rnd.nextInt(3))
        .map(_ => phrases(rnd.nextInt(phrases.length))).mkString(" ")
      (i, body)
    }.toDF("doc_id", "text").withColumn("blk", lit("b"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val crossProduct = norm(
      Dedup.ngramJaccardPairs(corpus, "text", "doc_id", Seq("blk"), 0.3))
    val prefixed = norm(
      Dedup.ngramJaccardPairsPrefix(corpus, "text", "doc_id", Seq("blk"), 0.3))
    assert(prefixed == crossProduct && crossProduct.nonEmpty)
  }

  test("simhash pigeonhole banding finds near-dups, skips unrelated") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // identical text → hamming 0
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated
    // recall guarantee: ANY pair with true hamming <= maxHamming is found
    val sk = docs.select(col("doc_id"), Dedup.simhash("text").as("s"))
    val truth = sk.as("l").crossJoin(sk.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .filter(Dedup.hamming(col("l.s"), col("r.s")) <= 2)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == truth) // pigeonhole banding is lossless at <= maxHamming
  }

  test("decontaminate drops corpus docs overlapping the benchmark set") {
    val bench = Seq((100L, "what is the capital of france paris obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a clean training document about spark shuffles and partitions"),
      // contains the benchmark 3-gram "capital of france" → contaminated
      (2L, "quiz answers the capital of france is paris of course it is"),
      (3L, "another unrelated document mentioning nothing sensitive at all"))
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // corpus rows pass through unchanged (schema + values)
    val full = Dedup.decontaminate(corpus, bench, "text", "doc_id").collect()
    assert(full.forall(_.length == 2))
  }

  test("connected components assign min id per dup cluster") {
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L), (3L, 9L), (9L, 4L))
      .toDF("id_a", "id_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L,
      3L -> 3L, 9L -> 3L, 4L -> 3L)
    // chains resolve transitively: {1,2,5}→1, {7,8}→7, {3,4,9}→3 — on
    // BOTH dispatch paths (driver union-find and distributed propagation)
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expect)
    val distributed = Dedup.connectedComponents(pairs, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expect)
  }

  test("connected components: long chain (distributed path halving)") {
    // a 40-node path graph — diameter 39 exercises the O(log d) halving
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 40 && cc.values.forall(_ == 0L))
  }

  test("maxBandBucket drops hot LSH buckets (spam guard)") {
    // 6 identical docs: every band bucket holds all 6 → capped at 3,
    // all buckets drop, no candidate pairs survive
    val spam = (0L until 6L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.minhashLsh(spam, "text", "doc_id", maxBandBucket = 3)
    assert(capped.count() == 0)
    val uncapped = Dedup.minhashLsh(spam, "text", "doc_id")
    assert(uncapped.count() == 15) // all 6-choose-2 pairs
  }

  test("shingle kernel is bit-identical to the SQL md5/conv chain") {
    // the native kernel must reproduce the SQL-composed hashes exactly —
    // the DuckDB oracle recomputes them with md5/conv on its side
    val sqlHashed = sort_array(transform(
      graft.ext.TextAnalysis.shingles("text"),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
    val rows = docs
      .withColumn("t2", lit("")) // degenerate empty-text path
      .select(
        graft.ext.TextAnalysis.hashedShingles("text").as("k"),
        sqlHashed.as("s"),
        graft.ext.TextAnalysis.hashedShingles("t2").as("k0"),
        sort_array(transform(graft.ext.TextAnalysis.shingles("t2"),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("s0"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("hashed sorted-array jaccard equals string-array jaccard") {
    // the verify path hashes shingles to sorted 60-bit longs; the merge-scan
    // jaccard must equal array_intersect/union over the original strings
    val t = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.shingles("text").as("sh"),
      graft.ext.TextAnalysis.hashedShingles("text").as("hs"))
    val both = t.as("l").crossJoin(t.as("r"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(
        Dedup.jaccardArr(col("l.sh"), col("r.sh")).as("j_str"),
        graft.functions.SetSimilarity.jaccardSorted(col("l.hs"), col("r.hs")).as("j_hash"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("boilerplateReport surfaces hot lines with their counts") {
    val df = Seq(
      (1L, "head\nbody one"), (2L, "head\nbody two"),
      (3L, "head\nunique"), (4L, "solo")).toDF("doc_id", "text")
    val got = Dedup.boilerplateReport(df, "text", maxOccurrences = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("head", 3L)))
    // at the default threshold the twice-occurring body lines still hide
    val loose = Dedup.boilerplateReport(df, "text")
      .collect().map(_.getString(0)).toSet
    assert(loose == Set("head"))
  }

  test("duplicatedSpans merges duplicated k-gram runs into maximal spans") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(
      (1L, shared + " ta tb tc"),
      (2L, shared + " td te tf"),
      (3L, "x1 x2 x3 x4 zz x1 x2 x3 x4 qq"),
      (4L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", k = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1/2 share a 10-token prefix (windows 0..6 → one maximal span);
    // doc 3 repeats a 4-gram WITHIN itself (two disjoint spans); doc 4 is
    // unique and hosts none
    assert(got.toSeq == Seq((1L, 0L, 10L), (2L, 0L, 10L),
      (3L, 0L, 4L), (3L, 5L, 4L)))
  }

  test("stripDuplicatedSpans removes covered tokens, preserves rows") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(
      (1L, shared + " ta tb tc"),
      (2L, shared + " td te tf"),
      (4L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(df, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "ta tb tc"), (2L, "td te tf"),
      (4L, "u1 u2 u3 u4 u5 u6")))
    // fully-duplicated documents become empty strings, rows preserved
    val dup = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got2 = Dedup.stripDuplicatedSpans(dup, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got2.toSeq == Seq("", ""))
  }

  test("sourceOverlap: asymmetric containment over distinct shingle sets") {
    // A = {xyz, yzw, yzq}, B = {xyz, yzw}, C = {ppp} (disjoint)
    val df = Seq(
      ("A", "x y z w"), ("A", "x y z q"),
      ("B", "x y z w"), ("C", "p p p p")).toDF("source", "text")
    val got = Dedup.sourceOverlap(df, "source", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("A", "B", 2L, 0.666667), ("B", "A", 2L, 1.0)))
  }

  test("dedup operators leave no persistent blocks (scoped cache lifetimes)") {
    val sc = spark.sparkContext
    def leakedBy(body: => Unit): Set[Int] = {
      val before = sc.getPersistentRDDs.keySet.toSet
      body
      sc.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leakedBy(
      Dedup.minhashLsh(docs, "text", "doc_id", minJaccard = 0.5).count()
    ).isEmpty, "minhashLsh leaked blocks")
    assert(leakedBy(
      Dedup.ngramJaccardPairsPrefix(docs.withColumn("blk", lit(1)),
        "text", "doc_id", Seq("blk"), 0.3).count()
    ).isEmpty, "ngramJaccardPairsPrefix leaked blocks")
    assert(leakedBy {
      val pairs = Dedup.minhashLsh(docs, "text", "doc_id", minJaccard = 0.5)
      Dedup.connectedComponents(pairs).count() // driver union-find path
    }.isEmpty, "connectedComponents (driver path) leaked blocks")
    // distributed path: per-round checkpoints and the edge table are
    // released as the loop advances; only the FINAL round's checkpoint may
    // remain — it backs the returned frame
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", minJaccard = 0.5)
    val left = leakedBy(
      Dedup.connectedComponents(pairs, localThreshold = 0).count())
    assert(left.size <= 1,
      s"connectedComponents (distributed path) left ${left.size} RDDs")
  }
}

class SimilaritySuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.95f, 0.05f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("semanticDedup keeps min-id canonicals and all singletons") {
    // label buckets: {0,1} near-parallel (dup pair), {2,3} near-parallel,
    // {4} singleton — survivors are the min ids 0 and 2 plus the singleton
    val out = Similarity.semanticDedup(vecs, 0.9, "label")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 2L, 4L))
  }

  test("brute-force top-k ranks by cosine") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 2L)).take(2) ||
      out.head == ((1, 1L))) // nearest is the almost-parallel vector
  }

  test("bucketed search only scans the matching bucket") {
    val out = Similarity.bucketTopK(vecs, vecs.filter($"vec_id" === 2), 5, "label")
      .collect().map(_.getLong(2)).toSet
    assert(out == Set(3L)) // only label-1 partners
  }

  test("hyperplane bucket groups parallel vectors") {
    val b = vecs.select($"vec_id", Similarity.hyperplaneBucket($"embedding").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L)) // nearly parallel → same bucket
    assert(b(2L) == b(3L))
  }

  test("hyperplane kernel: bit-identical to the SQL lambda chain, no lambdas in plan") {
    // the native kernel must reproduce the interpreted aggregate(zip_with)
    // composition exactly — same weights, same accumulation order
    def sqlBucket(vec: org.apache.spark.sql.Column, bits: Int) = {
      val planes = (0 until bits).map { i =>
        val proj = aggregate(
          zip_with(vec.cast("array<double>"),
            sequence(lit(0), size(vec) - 1).cast("array<double>"),
            (x, d) => x * (((lit(1.0) + pmod(lit(i * 31).cast("double") + d * 17.0, lit(61.0)))) - 30.5)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L)).otherwise(lit(0L)) * (1L << i)
      }
      planes.reduce(_ + _)
    }
    val rnd = new scala.util.Random(7)
    val wide = ((0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))) :+
      // NaN projection: Spark's comparison order sets the bit (NaN > 0)
      (50L, Array.tabulate(16)(d => if (d == 0) Float.NaN else 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = wide.select(
      Similarity.hyperplaneBucket($"embedding", 12).as("k"),
      sqlBucket($"embedding", 12).as("s")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // the bucket column compiles to the static kernel — no interpreted
    // higher-order functions left in the plan
    val plan = wide.select(Similarity.hyperplaneBucket($"embedding").as("b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction") && !plan.contains("aggregate("),
      plan.take(600))
    // null element mirrors the lambda chain: poisoned projection → bucket 0
    val withNull = Seq((1L, Array[java.lang.Double](1.0, null, 2.0)))
      .toDF("vec_id", "embedding")
    assert(withNull.select(Similarity.hyperplaneBucket($"embedding"))
      .collect()(0).getLong(0) == 0L)
  }
}

class CorpusCurationSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  test("curation drops near-dup copies, keeps canonicals, gates quality") {
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val docs = Seq(
      (10L, good),                       // canonical of the dup cluster
      (11L, good),                       // exact copy → dropped
      (12L, good + "tail"),              // near copy → dropped
      (20L, "another clean english document that is long enough to pass the gate " * 3),
      (30L, "!!!! ???? ///\\\\ ####"))   // junk → quality-gated
      .toDF("doc_id", "text")
    val out = graft.pipeline.CorpusCuration.curate(docs, minJaccard = 0.5)
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(10L, 20L))
  }

  test("incrementalCurate == full curate on the changed snapshot (night-2 run)") {
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val clean = "another clean english document that is long enough to pass the gate " * 3
    val third = "yet another perfectly ordinary and sufficiently long piece of text here " * 3
    // dup relations use EXACT copies (Jaccard 1 matches every LSH band)
    // so the expected survivor set is deterministic — banding recall at
    // J≈0.9 is probabilistic by design
    val oldCorpus = Seq(
      (10L, good), (11L, good),          // standing dup cluster
      (20L, clean), (40L, clean),        // standing dup cluster
      (30L, third))
      .toDF("doc_id", "text")
    val state = java.nio.file.Files
      .createTempDirectory("graft_cur_state").toString
    graft.pipeline.CorpusCuration.writeCurationState(oldCorpus, state,
      minJaccard = 0.5)
    // night 2: 10 removed (its dup 11 must now survive), 30 changed into
    // a copy of 20's cluster, 50/51 added as a fresh dup cluster, 52
    // added junk
    val newCorpus = Seq(
      (11L, good),
      (20L, clean), (40L, clean),
      (30L, clean),
      (50L, third), (51L, third),
      (52L, "!!!! ???? ////"))
      .toDF("doc_id", "text")
    val inc = graft.pipeline.CorpusCuration.incrementalCurate(spark,
        state, oldCorpus, newCorpus, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    val full = graft.pipeline.CorpusCuration.curate(newCorpus,
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(inc == full)
    // the run exercised every diff class: a revived survivor (11), a
    // changed doc joining a standing cluster (30 vs 20/40), a fresh
    // delta-only cluster (50/51), and the quality gate (52)
    assert(inc.map(_._1) == Set(11L, 20L, 50L))
    // night-3 state advance: the added+changed delta appends to the
    // index (stale rows for 30's old text remain — read paths filter by
    // live status, as incrementalCurate itself does)
    val delta = newCorpus.join(
      graft.ext.Dedup.snapshotDiff(oldCorpus, newCorpus, "doc_id", "text")
        .filter($"status".isin("added", "changed")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    graft.ext.Dedup.appendLshStore(delta, "text", "doc_id", s"$state/lsh")
    val banded = spark.read.parquet(s"$state/lsh/banded")
    // ids: 5 old ∪ {30 again, 50, 51, 52} = 8 distinct
    assert(banded.select("doc_id").distinct().count() == 8)
    // 30 carries BOTH its stale and fresh band rows — the append-only trade
    assert(banded.filter($"doc_id" === 30L).count() >
      banded.filter($"doc_id" === 50L).count())
  }

  test("classifier gate: curate(df, model) == curate(pre-gated df), stream shares it") {
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val spammy = "buy cheap pills now click here buy cheap pills now " * 3
    val docs = Seq(
      (10L, good), (11L, good),          // dup cluster, both classifier-pass
      (20L, "another clean english document that is long enough to pass the gate " * 3),
      (30L, spammy))                     // classifier-dropped
      .toDF("doc_id", "text")
    // train on a labeled slice: good-like positive, spam negative
    val labeled = Seq((1, good), (1, "clean english document text"),
      (0, spammy), (0, "buy cheap click now")).toDF("pos", "text")
    val m = TextAnalysis.nbTrain(labeled, "text", $"pos" === 1)
    val gated = graft.pipeline.CorpusCuration.curate(docs,
        minJaccard = 0.5, classifier = Some(m))
      .collect().map(_.getLong(0)).toSet
    val manual = graft.pipeline.CorpusCuration.curate(
        docs.filter(TextAnalysis.nbScore(m, "text") > 0), minJaccard = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(gated == manual)
    assert(!gated.contains(30L) && gated.contains(10L) && gated.contains(20L))
    // the streaming path applies the same stateless column
    val withTs = docs.withColumn("ts",
      org.apache.spark.sql.functions.col("doc_id").cast("timestamp"))
    val streamGated = graft.pipeline.CorpusCuration.curateStream(withTs,
        None, windowDur = "1000 seconds", watermark = "10 seconds",
        classifier = Some(m))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!streamGated.contains(30L))
  }

  test("curateStream: decontaminate + gate + windowed dedup, batch == stream") {
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val leaky = "a quick brown fox benchmark question appears here today " * 3
    val docs = Seq(
      (10L, good),              // survives
      (11L, good),              // in-window exact dup of 10 → dropped
      (20L, leaky),             // shares a bench 3-gram → decontaminated
      (30L, "!!!! ????"),       // junk → quality-gated
      (40L, "another clean english document that is long enough to pass the gate " * 3),
      // flush sentinel: far-future event advances the watermark past the
      // first window so append mode emits it; its OWN window stays open
      (100000L, "distinct flush sentinel body that is long and clean enough to pass " * 3))
      .toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions.col("doc_id").cast("timestamp"))
    // trigrams hit only `leaky` ("… fox benchmark question …"), not `good`
    val bench = Seq((0L, "fox benchmark question time")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.CorpusCuration.curateStream(df, Some(bench),
        windowDur = "100 seconds", watermark = "10 seconds")
    val batch = run(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == Set(10L, 40L, 100000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = run(spark.readStream.schema(docs.schema).parquet(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("curate_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch - 100000L) // sentinel's window never closes
  }

  test("trainingMix: curate → decontaminate → budget → shard → pack, " +
      "composed invariants hold and the output is layout-invariant") {
    import org.apache.spark.sql.functions.col
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val clean2 = "another clean english document that is long enough to pass the gate " * 3
    val leaky = "a quick brown fox benchmark question appears here today " * 3
    val docs = (Seq(
      (10L, "web", good),       // canonical of the dup cluster
      (11L, "web", good),       // exact dup → dropped by curate
      (20L, "web", leaky),      // shares a bench 3-gram → decontaminated
      (30L, "web", "!!!! ????")) ++ // junk → quality-gated
      (40L until 60L).map(i => (i, "wiki", clean2 + s" tail$i")))
      .toDF("doc_id", "source", "text")
    val bench = Seq((0L, "fox benchmark question time")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.CorpusCuration.trainingMix(df, Some(bench),
        budgetPerSource = 300L, ctxLen = 64, nShards = 4, salt = "t",
        minJaccard = 0.5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val out = run(docs)
    val ids = out.map(_._3)
    assert(ids.contains(10L) && !ids.contains(11L)) // dedup kept the canonical
    assert(!ids.contains(20L))                      // decontaminated
    assert(!ids.contains(30L))                      // quality-gated
    // wiki budget: each tail doc is ~36 tokens; 300 tokens keep ~8 of 20
    val wiki = ids.filter(_ >= 40L)
    assert(wiki.nonEmpty && wiki.size < 20)
    // packing invariants per shard: in shuffled order, offsets are the
    // running sum (contiguous token stream), seq ids cover each doc's span
    out.groupBy(_._1).foreach { case (_, rs) =>
      val docsIn = rs.map(r => (r._3, r._4, r._5)).toSeq.distinct.sortBy(_._2)
      var runTok = 0L
      docsIn.foreach { case (_, start, ntok) =>
        assert(start == runTok); runTok += ntok
      }
      rs.foreach { case (_, seq, _, start, ntok) =>
        assert(seq >= start / 64 && seq <= (start + ntok - 1) / 64)
      }
    }
    // bit-reproducible on a different input layout
    assert(run(docs.repartition(13)) == out)
  }

  test("new-op plan shapes: shuffleShards narrow, token budget one window exchange") {
    import org.apache.spark.sql.functions.col
    val docs = (0L until 100L)
      .map(i => (i, "s" + i % 2, "w x y z " * (i % 5 + 1).toInt))
      .toDF("doc_id", "source", "text")
    // sharding must stay a narrow projection — no exchange anywhere
    val shardPlan = Sampling.shuffleShards(docs, "doc_id", 8)
      .queryExecution.executedPlan.toString
    assert(!shardPlan.contains("Exchange"), shardPlan.take(400))
    // budget selection: exactly one hash exchange (the per-source window)
    val sel = TextAnalysis.selectByTokenBudget(docs, "text", "doc_id", 50L)
    sel.count()
    val p = sel.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(600))
  }

  test("streaming curation end-to-end: parquet source → parquet sink, " +
      "checkpoint-restart drain matches the batch twin") {
    import org.apache.spark.sql.functions.col
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val docs = Seq(
      (10L, good),              // survives
      (11L, good),              // in-window exact dup of 10 → dropped
      (30L, "!!!! ????"),       // junk → quality-gated
      (40L, "another clean english document that is long enough to pass the gate " * 3))
      .toDF("doc_id", "text")
      .withColumn("ts", col("doc_id").cast("timestamp"))
    val src = java.nio.file.Files.createTempDirectory("graft_cstream_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_cstream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cstream_ckpt").toString
    docs.write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = graft.pipeline.CorpusCuration.curateStream(
        spark.readStream.schema(docs.schema).parquet(src), None,
        windowDur = "100 seconds", watermark = "10 seconds")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    // the watermark (max ts 40s − 10s) has not passed the [0,100s) window
    // yet — append mode has emitted nothing, but state is checkpointed
    val sinkSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ws",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    assert(spark.read.schema(sinkSchema).parquet(sink).isEmpty)
    // drain at "shutdown": append one clean far-future document to the
    // SOURCE, restart the query on its existing checkpoint — the next
    // micro-batch's watermark closes the first window and flushes its
    // survivors to the sink (the sessionization drain recipe, composed
    // over the curation pipeline)
    Seq((100000L, "distinct flush sentinel body that is long and clean enough to pass " * 3))
      .toDF("doc_id", "text")
      .withColumn("ts", col("doc_id").cast("timestamp"))
      .write.mode("append").parquet(src)
    runOnce()
    val streamed = spark.read.parquet(sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch twin over the SAME post-drain source; the sentinel's own
    // window never closes, so it is the one row append mode withholds
    val batch = graft.pipeline.CorpusCuration.curateStream(
      spark.read.parquet(src), None,
      windowDur = "100 seconds", watermark = "10 seconds")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch - 100000L)
    assert(streamed == Set(10L, 40L))
  }

  test("injected mega-bucket: skew guard bounds candidate volume") {
    // 40 identical boilerplate docs share EVERY band → one bucket of 40
    // in each of the 4 bands → 4 × 40² candidate shape without the guard.
    // With maxBandBucket = 10 every boilerplate bucket is dropped wholesale
    // (zero pairs from the mega-bucket, not 780), while a genuine small
    // dup cluster elsewhere still collapses through its sub-cap buckets.
    val good = "the quick brown fox jumps over the lazy dog and it is fine " * 3
    val boiler = "this page is intentionally left blank and the content is gone " * 3
    val docs = (Seq((10L, good), (11L, good)) ++
      (100L until 140L).map(i => (i, boiler))).toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.minhashLsh(docs, "text", "doc_id",
      numHashes = 16, bands = 4, minJaccard = 0.5, maxBandBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L))) // mega-bucket contributed ZERO pairs
    // end-to-end: curate with the guard keeps all boilerplate copies (the
    // documented recall tradeoff) but still dedups the genuine cluster
    val out = graft.pipeline.CorpusCuration.curate(docs, minJaccard = 0.5,
      maxBandBucket = 10).collect().map(_.getLong(0)).toSet
    assert(!out.contains(11L) && out.contains(10L))
    assert((100L until 140L).forall(out.contains))
  }
}

class SamplingSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, s"doc$i",
    if (i % 3 == 0) "en" else if (i % 3 == 1) "pt" else "es"))
    .toDF("doc_id", "text", "lang")

  test("hashFraction: deterministic, partitioning-invariant, ~uniform") {
    val a = Sampling.hashFraction(docs, "doc_id", 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashFraction(docs.repartition(16), "doc_id", 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)                              // same rows on any layout
    assert(math.abs(a.size - 500) < 100)        // ~25% of 2000
    // monotone: a smaller fraction is a subset of a larger one (the
    // property that makes corpus down-scaling reproducible)
    val smaller = Sampling.hashFraction(docs, "doc_id", 0.1, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(a))
    // a different salt draws a different sample
    val other = Sampling.hashFraction(docs, "doc_id", 0.25, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(other != a)
  }

  test("shuffleShards: deterministic, layout-invariant, balanced, " +
      "independent order key") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(df, "doc_id", 8, salt = "x")
        .select("doc_id", "shard", "shard_order")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run(docs)
    val b = run(docs.repartition(16))
    assert(a.toSet == b.toSet) // assignment survives any input layout
    // every shard populated, roughly uniform (2000/8 = 250)
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.forall(n => n > 150 && n < 350))
    // the within-shard order key is independent of the id order: sorting
    // shard 0 by shard_order must not reproduce ascending doc_id
    val s0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(s0.length > 10 && !(s0 sameElements s0.sorted))
    assert(a.map(_._3).distinct.length == a.length) // order key collision-free here
    // a different salt reshards
    val c = Sampling.shuffleShards(docs, "doc_id", 8, salt = "y")
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(c.toSet != a.map(t => (t._1, t._2)).toSet)
  }

  test("hashSplit: total partition, stable, ~weight proportions") {
    val out = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), "v0")
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2))
    assert(counts.values.sum == 2000L)          // total: every row in one split
    assert(math.abs(counts(0) - 1600L) < 150)
    assert(math.abs(counts(1) - 200L) < 80 && math.abs(counts(2) - 200L) < 80)
    // leak-safety: the assignment of old rows is unchanged when new rows
    // arrive (pure function of id+salt)
    val half = Sampling.hashSplit(docs.filter(col("doc_id") < 1000),
      "doc_id", Seq(0.8, 0.1, 0.1), "v0")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = out.select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
  }

  test("mixture: ~target proportions, caps at source size, deterministic") {
    // srcA 1000 rows, srcB 1000 rows, srcC only 20 rows
    val mixed = ((0L until 1000L).map(i => (i, "srcA")) ++
      (1000L until 2000L).map(i => (i, "srcB")) ++
      (2000L until 2020L).map(i => (i, "srcC")) ++
      (3000L until 3100L).map(i => (i, "ignored")))
      .toDF("doc_id", "source")
    val out = Sampling.mixture(mixed, "source",
      Map("srcA" -> 0.5, "srcB" -> 0.3, "srcC" -> 0.2), 200L, "doc_id", "t")
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("ignored"))          // unweighted sources dropped
    assert(math.abs(counts("srcA") - 100L) < 40) // 50% of 200
    assert(math.abs(counts("srcB") - 60L) < 35)  // 30% of 200
    assert(counts("srcC") == 20L)                // target 40 > |srcC| → all of it
    // deterministic across layouts
    val again = Sampling.mixture(mixed.repartition(16), "source",
      Map("srcA" -> 0.5, "srcB" -> 0.3, "srcC" -> 0.2), 200L, "doc_id", "t")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("stratifiedSampleN: exactly n per stratum, deterministic, group-limited") {
    val out = Sampling.stratifiedSampleN(docs, Seq("lang"), 10, "doc_id", "s")
    val perLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("en" -> 10L, "pt" -> 10L, "es" -> 10L))
    // deterministic across layouts
    val again = Sampling.stratifiedSampleN(docs.repartition(16), Seq("lang"),
      10, "doc_id", "s").select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // small strata are taken whole
    val tiny = Sampling.stratifiedSampleN(docs.filter(col("doc_id") < 5),
      Seq("lang"), 10, "doc_id", "s")
    assert(tiny.count() == 5)
    // the rank <= n cut runs as a partial top-n, not a full per-group sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }
}

class IvfSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  // two tight, well-separated clusters around (10,0,...) and (-10,0,...)
  private lazy val vecs = {
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i.toLong, Array.tabulate(4)(d => (if (d == 0) base else 0.0) + (i % 5) * 0.1))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("k-means separates well-separated clusters") {
    val c = Ivf.train(vecs, k = 2, iters = 4)
    assert(c.length == 2)
    // one centroid near +10, the other near -10 on dim 0
    assert(c.map(_(0)).sorted.zip(Seq(-10.0, 10.0)).forall {
      case (got, want) => math.abs(got - want) < 1.0 })
    val buckets = Ivf.assign(vecs, c).select("vec_id", "ivf_bkt")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every even id shares one bucket, every odd id the other
    assert(buckets.filterKeys(_ % 2 == 0).values.toSet.size == 1)
    assert(buckets.filterKeys(_ % 2 == 1).values.toSet.size == 1)
    assert(buckets(0L) != buckets(1L))
  }

  test("IVF store: probes prune partitions at planning time") {
    val c = Ivf.train(vecs, k = 2, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/store"
    Ivf.writeStore(vecs, path, c)
    val queries = vecs.filter(col("vec_id") === 0)
    val out = Ivf.topKFromStore(spark, path, queries, 5, c, nprobe = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_bkt"))
    // pruned search equals the in-memory nprobe=1 path
    val viaMem = Ivf.topK(vecs, queries, 5, c, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaStore = out
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaStore == viaMem && viaStore.nonEmpty)
  }

  test("PQ: codes reconstruct clusters; rerank >= corpus equals brute force") {
    val cb = Pq.train(vecs, m = 2, ksub = 4, iters = 4)
    assert(cb.m == 2 && cb.dsub == 2 && cb.centroids.forall(_.length == 4))
    // ADC of a vector against its own code = squared reconstruction error;
    // with 4 codewords per 2-dim subspace on 2 tight clusters it is small
    val enc = Pq.encode(vecs, cb)
    val adc = enc.select(graft.functions.PqAdc.column(
        col("pq_code"), col("embedding").cast("array<double>"), cb.centroids))
      .collect().map(_.getDouble(0))
    assert(adc.forall(_ < 1.0), s"max recon err ${adc.max}")
    // two-stage search with full rerank budget ≡ exact brute force
    val queries = vecs.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaPq = Pq.topK(vecs, queries, 5, cb, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaPq == exact)
    // tight rerank budget still recalls the true top-5 on clustered data
    val tight = Pq.topK(vecs, queries, 5, cb, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert((tight intersect exact).size >= 4, s"recall ${tight intersect exact}")
  }

  test("IVFPQ store: partition-pruned code scan, exact at full budgets") {
    val cb = Pq.train(vecs, m = 2, ksub = 4, iters = 4)
    val coarse = Ivf.train(vecs, k = 2, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/store"
    Pq.writeStore(vecs, path, cb, Some(coarse))
    val queries = vecs.filter(col("vec_id") === 0)
    val out = Pq.topKFromStore(spark, path, vecs, queries, 5, cb,
      rerank = 40, coarse = Some(coarse), nprobe = 2)
    // nprobe = k and rerank >= corpus → exact brute force, through a store
    // whose candidate scan reads only (id, code) columns
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet == exact)
    // the probe is partition pruning, not a filter
    val pruned = Pq.topKFromStore(spark, path, vecs, queries, 5, cb,
      rerank = 40, coarse = Some(coarse), nprobe = 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_bkt"))
    // nprobe = 1 stays inside the query's own (even-id) cluster
    val ids = pruned.collect().map(_.getLong(2)).toSet
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0))
    // flat code store (no coarse quantizer) also round-trips
    val flat = java.nio.file.Files.createTempDirectory("graft_pqf").toString + "/s"
    Pq.writeStore(vecs, flat, cb)
    assert(Pq.topKFromStore(spark, flat, vecs, queries, 5, cb, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == exact)
  }

  test("residual IVFPQ store: pruned residual-code scan, exact at full budgets") {
    val shifted = vecs.withColumn("embedding",
      expr("transform(embedding, x -> x + 1000.0)"))
    val coarse = Ivf.train(shifted, k = 2, iters = 4)
    val cb = Pq.trainResidual(shifted, coarse, m = 2, ksub = 4, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("graft_pqr").toString + "/store"
    Pq.writeStore(shifted, path, cb, Some(coarse), residual = true)
    val queries = shifted.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(shifted, queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val out = Pq.topKFromStore(spark, path, shifted, queries, 5, cb,
      rerank = 40, coarse = Some(coarse), nprobe = 2, residual = true)
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet == exact)
    // the probe still prunes partitions; nprobe = 1 stays in-cluster
    val pruned = Pq.topKFromStore(spark, path, shifted, queries, 5, cb,
      rerank = 40, coarse = Some(coarse), nprobe = 1, residual = true)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_bkt"))
    val ids = pruned.collect().map(_.getLong(2)).toSet
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0))
  }

  test("residual IVFPQ: smaller reconstruction error, exact at full budgets") {
    // shift both clusters far from the origin: plain PQ must spend its
    // codewords on absolute position, residual PQ only on local structure
    val shifted = vecs.withColumn("embedding",
      expr("transform(embedding, x -> x + 1000.0)"))
    val coarse = Ivf.train(shifted, k = 2, iters = 4)
    val plain = Pq.train(shifted, m = 2, ksub = 2, iters = 4)
    val resid = Pq.trainResidual(shifted, coarse, m = 2, ksub = 2, iters = 4)
    def reconErr(codes: org.apache.spark.sql.DataFrame, cb: Pq.Codebooks,
        vec: org.apache.spark.sql.Column): Double =
      codes.select(graft.functions.PqAdc.column(col("pq_code"), vec,
          cb.centroids).as("e"))
        .agg(org.apache.spark.sql.functions.avg("e")).collect()(0).getDouble(0)
    val plainErr = reconErr(Pq.encode(shifted, plain),
      plain, col("embedding").cast("array<double>"))
    val residErr = reconErr(
      Pq.encodeResidual(shifted, coarse, resid)
        .withColumn("_r", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("_r", graft.ext.Pq.residualFor(col("_r"), col("ivf_bkt"), coarse)),
      resid, col("_r"))
    assert(residErr < plainErr,
      s"residual $residErr should beat plain $plainErr on shifted clusters")
    // exactness: nprobe = k, rerank >= corpus → identical to brute force
    val queries = shifted.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(shifted, queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaResid = Pq.topKResidual(shifted, queries, 5, coarse, resid,
      rerank = 40, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaResid == exact)
  }

  test("duplicate query rows don't corrupt the probed top-k") {
    // a queries DF carrying the same vec_id twice (e.g. from a join) must
    // behave as if it appeared once — the probed candidate branch dedups
    // (query_id, ivf_bkt) like the flat branch dedups query_id
    val coarse = Ivf.train(vecs, k = 2, iters = 4)
    val cb = Pq.trainResidual(vecs, coarse, m = 2, ksub = 4, iters = 4)
    val q1 = vecs.filter(col("vec_id") === 0)
    val q2 = q1.union(q1) // duplicated query row
    def run(q: org.apache.spark.sql.DataFrame) =
      Pq.topKResidual(vecs, q, 5, coarse, cb, rerank = 40, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run(q2) == run(q1))
  }

  test("NaN query vectors neither crash nor match (probe list empty)") {
    val c = Ivf.train(vecs, k = 2, iters = 2)
    val bad = Seq((99L, Array(Double.NaN, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    // used to AIOOBE inside ProbeCentroids; now the row just yields no probes
    assert(Ivf.topK(vecs, bad, 5, c, nprobe = 2).count() == 0)
  }

  test("vector_mean: flat single-aggregate plan and exact means at dim 512") {
    val dim = 512
    val n = 50
    val hi = (0 until n).map(i =>
        (i.toLong, Array.tabulate(dim)(d => (i * dim + d) * 0.001)))
      .toDF("vec_id", "embedding")
    val agg = hi.groupBy(lit(0).as("b"))
      .agg(graft.agg.VectorMeanAgg.column(
        col("embedding").cast("array<double>")).as("c"))
    // the plan carries ONE aggregate, not dim × avg(embedding[i])
    val plan = agg.queryExecution.optimizedPlan.toString
    assert(plan.contains("vector_mean"))
    assert(!plan.contains("avg("))
    val got = agg.collect()(0).getSeq[Double](1).toArray
    val want = Array.tabulate(dim)(d =>
      (0 until n).map(i => (i * dim + d) * 0.001).sum / n)
    assert(got.length == dim)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    // k = 1 training: every row lands in bucket 0, centroid = corpus mean
    val c = Ivf.train(hi, k = 1, iters = 1)
    assert(c.length == 1 && c(0).length == dim)
    c(0).zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("vector_mean: skips null vectors, empty group yields null") {
    val df = Seq(
      (0, Some(Array(1.0, 3.0))), (0, None), (0, Some(Array(3.0, 5.0))),
      (1, None)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(graft.agg.VectorMeanAgg.column(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(0).get.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(2.0, 4.0))
    assert(out(1).isEmpty)
  }

  test("nprobe = k equals brute force; nprobe = 1 stays in-cluster") {
    val c = Ivf.train(vecs, k = 2, iters = 4)
    val queries = vecs.filter(col("vec_id") < 2)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val all = Ivf.topK(vecs, queries, 5, c, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(all == exact)
    // nprobe=1: results only come from the query's own cluster (same parity)
    val pruned = Ivf.topK(vecs, queries, 5, c, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pruned.nonEmpty)
    pruned.foreach { case (q, cid) => assert(q % 2 == cid % 2) }
  }
}

class MultimodalSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private lazy val media = Multimodal.synthesizeFromText(
    Seq((1L, "hello world"), (2L, "abc")).toDF("id", "text"), "text", "id")

  test("schema: binary media + typed metadata struct") {
    val f = media.schema("media")
    assert(f.dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
  }

  test("batched decode path equals per-row stub features") {
    val ds = media.as[Multimodal.MediaRow]
    val batched = Multimodal.decodeFeatures(ds, batchSize = 1).collect().sortBy(_.id)
    val direct = ds.collect().map(Multimodal.stubDecode).sortBy(_.id)
    assert(batched.toSeq == direct.toSeq)
    assert(batched(0).nBytes == "hello world".length)
  }

  test("frame sampling explodes every nth frame with index") {
    val out = Multimodal.frameSample(media, 2).collect()
    assert(out.forall(_.getInt(1) % 2 == 0))
    assert(out.nonEmpty)
  }

  test("resize stub rewrites metadata only") {
    val out = Multimodal.resizeStub(media, 64, 64)
      .select("meta.width", "meta.height").distinct().collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((64, 64)))
  }

  test("palette-indexed images decode through the palette, not raw indices") {
    // 2-entry palette: index 0 → black, 1 → white, half-half image — the
    // mean of raw indices would be 0.5; true luminance is 127.5
    val icm = new java.awt.image.IndexColorModel(1, 2,
      Array[Byte](0, -1), Array[Byte](0, -1), Array[Byte](0, -1))
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    img.getRaster.setSample(0, 0, 0, 0)
    img.getRaster.setSample(1, 0, 0, 1)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val f = Multimodal.decodeImage(Multimodal.MediaRow(1L, bos.toByteArray,
      Multimodal.MediaMeta("gif", 2, 1, 1)))
    assert((f.width, f.height) == (2, 1))
    assert(f.brightness == 127.5)
  }

  test("image rows decode for REAL through ImageIO: dims + mean luminance") {
    val ids = Seq(3L, 10L, 47L)
    val imgs = Multimodal.synthesizeImages(ids.toDF("id"), "id")
    val got = Multimodal.decodeFeatures(imgs).collect()
      .map(f => f.id -> f).toMap
    ids.foreach { id =>
      val w = (id % 13 + 3).toInt
      val h = (id % 7 + 2).toInt
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 13) % 256).toDouble).sum / (w * h)
      val f = got(id)
      assert((f.width, f.height) == (w, h))
      assert(math.abs(f.brightness - expect) < 1e-9)
      // the digest is of the PNG container, not the pixels — non-empty and
      // distinct from the raw-bytes stub path is what matters here
      assert(f.nBytes > 8 && f.digest.length == 32)
    }
  }
}

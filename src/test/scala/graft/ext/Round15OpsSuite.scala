package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

/** Round-15 (optimization round 2) pins: the NB argmax restructure —
  * `min(struct(-score, cls, …))` must select exactly the row the old
  * `row_number() OVER (PARTITION BY id ORDER BY score DESC, cls)` form
  * selected, including on ties (equal 6 dp-rounded scores), negative
  * scores, and the ±0.0 boundary. */
class Round15OpsSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  /** The pre-r15 window-argmax form, kept here as the reference. */
  private def windowArgmax(scored: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("cls").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("n_tokens"), col("cls").as("pred"),
        col("score"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("nbArgmax == window argmax on random score grids with forced ties") {
    val rnd = new scala.util.Random(151)
    // scores drawn from a TINY rounded set so most docs carry several
    // exact ties; classes include ordering-sensitive names (prefix pairs,
    // digits vs letters) so the cls-asc tie-break is actually exercised
    val classes = Seq("a", "aa", "b", "de", "en", "z0", "z1")
    for (trial <- 0 until 3) {
      val grid = for {
        doc <- 0 until 200
        cls <- classes
      } yield (doc.toLong, cls,
        math.round(rnd.nextInt(5) * 0.25 * 1e6 - 5e5) / 1e6,
        (doc % 7).toLong)
      val scored = grid.toDF("doc_id", "cls", "score", "n_tokens")
      val got = rows(TextAnalysis.nbArgmax(scored, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("pred"), col("score")))
      val want = rows(windowArgmax(scored, "doc_id"))
      assert(got == want, s"trial $trial")
    }
  }

  test("nbArgmax tie-break matches the window at the ±0.0 boundary") {
    // -0.0 and 0.0 must compare EQUAL (Spark's SQLOrderingUtil double
    // ordering) on both paths, so the tie falls through to cls asc
    val scored = Seq(
      (1L, "b", 0.0, 3L), (1L, "a", -0.0, 3L),
      (2L, "b", -0.0, 4L), (2L, "a", 0.0, 4L),
      (3L, "z", -1.5, 2L), (3L, "y", -1.5, 2L)
    ).toDF("doc_id", "cls", "score", "n_tokens")
    val got = TextAnalysis.nbArgmax(scored, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "a", 2L -> "a", 3L -> "y"))
    // the selected score survives the -x round-trip bit-for-bit
    val want = rows(windowArgmax(scored, "doc_id"))
    assert(rows(TextAnalysis.nbArgmax(scored, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("pred"),
        col("score"))) == want)
  }

  test("graph fast-path admission: NULL endpoints and oversized/NULL seeds fall through to the distributed loop") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val sch = StructType(Seq(StructField("src", LongType, nullable = true),
      StructField("dst", LongType, nullable = true)))
    // a NULL endpoint: the distributed joins drop it; the local path
    // must select AWAY rather than NPE (ADVICE r14)
    val eNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2L), Row(2L, 3L),
        Row(null, 5L), Row(3L, 1L))), sch)
    // NOTE the distributed loop emits a (NULL, pr) row for the NULL
    // endpoint (it survives the nodes union-distinct) — compare with
    // Option keys; the guarded path must take the SAME (distributed)
    // path and so agree exactly
    def prMap(df: org.apache.spark.sql.DataFrame): Map[Option[Long], Double] =
      df.collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getDouble(1))).toMap
    val viaGuard = prMap(Graph.pageRank(eNull, "src", "dst", 3))
    val distributed = prMap(Graph.pageRank(eNull, "src", "dst", 3,
      localThreshold = 0))
    assert(viaGuard.keySet == distributed.keySet)
    viaGuard.foreach { case (k, v) =>
      assert(math.abs(v - distributed(k)) < 1e-12) }
    // seed set larger than the threshold: bfsHops must stay distributed
    // (bounded seed pull) and still return the right hops
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val manySeeds = (1L to 100L).toDF("node")
    val hops = Graph.bfsHops(e, manySeeds, "src", "dst", "node", 2,
        localThreshold = 50)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(hops(1L) == 0 && hops(2L) == 0 && hops(3L) == 0)
    // NULL seed node: labelPropagation falls through (the distributed
    // join drops the NULL row) instead of NPE-ing on getLong
    val seedSch = StructType(Seq(StructField("node", LongType, true),
      StructField("lab", StringType, true)))
    val nullSeed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(null, "b"))),
      seedSch)
    val lp = Graph.labelPropagation(e, nullSeed, "src", "dst", "node",
      "lab", 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lp(1L) == "a" && lp(2L) == "a" && lp(3L) == "a")
  }

  test("nbMulticlassTokens end-to-end: duplicated class corpora tie to the first class") {
    // classes "mm" and "aa" get IDENTICAL token streams, so every doc's
    // two scores are exactly equal and pred must be the
    // lexicographically-first class — the real-path tie case
    val docs = (0 until 40).flatMap { i =>
      val toks = Seq(s"tok${i % 5}", "common", s"w${i % 3}")
      Seq((i.toLong * 2, "mm", toks), (i.toLong * 2 + 1, "aa", toks))
    }.toDF("doc_id", "cls", "toks")
    val out = TextAnalysis.nbMulticlassTokens(docs, "doc_id").collect()
    assert(out.length == 80)
    // both label classes have the same priors and token counts, so each
    // doc's "aa" and "mm" scores are identical and "aa" must win
    assert(out.forall(_.getString(2) == "aa"))
  }
}

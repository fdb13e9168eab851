package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock breakdown of a declared query (guide §1 empirical,
  * UI-less sandbox edition): a SparkListener records every job's duration
  * and call site while the query runs once (after one untimed warmup), so
  * "2.6 s" attributes to the pins / collects / aggregate jobs that spend
  * it. Diagnostics only — not part of the driver contract.
  *
  * Usage: runMain graft.ProbeJobs <sfDir> <nameSubstr...>
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "lineitem").limit(1).collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // last stage's name = the action's call site (e.g. "collect at
        // Eval.scala:123"); enough to attribute the job to an operator
        val site = js.stageInfos.lastOption.map(si =>
          s"${si.name} [tasks=${si.numTasks}]").getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, je.time - t0, site))
        }
      }
    })

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }
    qs.foreach { case (name, fn) =>
      val sc = spark.sparkContext
      // warmup (untimed) with block release, exactly the bench discipline
      val before = sc.getPersistentRDDs.keySet.toSet
      fn(spark, sfDir).foreach((_: org.apache.spark.sql.Row) => ())
      (sc.getPersistentRDDs.keySet.toSet -- before)
        .foreach(id => sc.getPersistentRDDs.get(id)
          .foreach(_.unpersist(blocking = false)))
      Thread.sleep(500)
      done.clear()
      val b2 = sc.getPersistentRDDs.keySet.toSet
      val t0 = System.nanoTime()
      fn(spark, sfDir).foreach((_: org.apache.spark.sql.Row) => ())
      val total = (System.nanoTime() - t0) / 1e9
      (sc.getPersistentRDDs.keySet.toSet -- b2)
        .foreach(id => sc.getPersistentRDDs.get(id)
          .foreach(_.unpersist(blocking = false)))
      Thread.sleep(300)
      val rows = done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
      val sum = rows.map(_._2).sum / 1e3
      println(f"== $name total=$total%.3f s, jobs=${rows.length}, job-sum=$sum%.3f s")
      rows.foreach { case (id, ms, site) =>
        println(f"   job $id%4d  ${ms / 1e3}%7.3f s  $site")
      }
    }
    spark.stop()
  }
}

package graft.operators

/** Ad-hoc plan inspector: `sbt "Test/runMain graft.operators.PlanAudit
  * q10_factorize [q21_minhash_lsh ...]"` prints each query's final AQE
  * plan after one execution — the loop for checking that filters reach
  * the scan, joins broadcast when they should, and codegen spans stay
  * wide. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.agg.SparkTest.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q10_factorize")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"=== $name final (AQE) plan ===")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** r15 plan-evidence tool: the registry bodies of the NB-family queries
  * PIN their results (materializedWithout), so `graft.Plans` dumps only
  * the pinned tail — this main explains the LAZY operator frames the
  * pins materialize, which is where the r15 argmax restructure lives.
  * Diagnostics only — not part of the driver contract.
  *
  * Usage: runMain graft.PlansR15 <sfDir> <outDir> <tag>
  */
object PlansR15 {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, tag) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      System.err.println(s"[plansR15] wrote $name")
    }
    val base = QueryShared.nbLangBase(spark, sfDir)
    dump("q112_nb_argmax_operator",
      ext.TextAnalysis.nbMulticlassTokens(base, "doc_id"))
    dump("q173_nb_labelissues_operator",
      ext.TextAnalysis.nbLabelIssuesTokens(base, "doc_id"))
    spark.stop()
  }
}

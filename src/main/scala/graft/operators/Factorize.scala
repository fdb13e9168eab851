package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** String → dense integer codes, the engine's analog of `pd.factorize`
  * (/root/reference/pd_vtk.py:474-498, vtk_flag_regions.py:21-26).
  *
  * The reference assigns codes in first-appearance order, which is undefined
  * under parallelism; codes here follow SORTED value order (deterministic,
  * documented deviation — SURVEY.md §2.3). Nulls get no code (null index,
  * like pandas' −1 rendered as null).
  *
  * Scale: the dimension side is `distinct` of one column, range-repartitioned
  * and sorted within partitions, with codes assigned by `zipWithIndex` —
  * globally sorted order with NO single-partition global window, so a
  * high-cardinality column (doc ids, user ids) factorizes without collapsing
  * to one task. The join back carries no broadcast hint: AQE picks a
  * broadcast join when the dimension's runtime size is under
  * `spark.sql.autoBroadcastJoinThreshold` and a shuffled join when it is
  * not, so a billion-key dimension cannot OOM the driver.
  */
object Factorize {
  def apply(df: DataFrame, column: String, indexCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(column)).where(col(column).isNotNull).distinct()
      .repartitionByRange(col(column)).sortWithinPartitions(col(column))
    // range partitions are ordered by key range, so zipWithIndex (one count
    // job + one map) hands out indices in global sorted order
    val schema = sorted.schema.add(indexCol, LongType, nullable = false)
    val dim = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    df.join(dim, Seq(column), "left")
  }
}

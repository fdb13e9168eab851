package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String → dense integer codes, the engine's analog of `pd.factorize`
  * (/root/reference/pd_vtk.py:474-498, vtk_flag_regions.py:21-26).
  *
  * The reference assigns codes in first-appearance order, which is undefined
  * under parallelism; codes here follow SORTED value order (deterministic,
  * documented deviation — SURVEY.md §2.3). Nulls get no code (null index,
  * like pandas' −1 rendered as null).
  *
  * Scale: the dimension side is `distinct` of one column — tiny for
  * categorical variables — so the join back is a broadcast hash join, no
  * shuffle of the fact table.
  */
object Factorize {
  def apply(df: DataFrame, column: String, indexCol: String): DataFrame = {
    val dim = df.select(col(column)).where(col(column).isNotNull).distinct()
      .withColumn(indexCol,
        (row_number().over(Window.orderBy(col(column))) - 1).cast("long"))
    df.join(broadcast(dim), Seq(column), "left")
  }
}

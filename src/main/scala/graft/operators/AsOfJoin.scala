package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row with
  * `rightTime <= leftTime` within the same key — the time-series enrichment
  * join Spark lacks natively (beyond-reference surface; the standard
  * union-tag-window formulation).
  *
  * Shape at scale: ONE shuffle of both sides on the key, then a per-key
  * sort — no range explosion, no broadcast requirement; skew is bounded by
  * the hottest key and AQE skew splitting applies. The right row's columns
  * travel as a single struct so the picked values always come from the SAME
  * right row (per-column `last` could mix rows when values are null).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val vStruct = struct(valueCols.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))))
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(1).as("__isL") +: nullStruct.as("__v") +:
        lCols.map(c => col(c).as(s"__l_$c"))): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(0).as("__isL") +: vStruct.as("__v") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))): _*)
    // right rows sort before left rows at equal timestamps → `<=` semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isL"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
      .select(lCols.map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}

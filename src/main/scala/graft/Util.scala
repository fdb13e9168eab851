package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

object Util {
  /** Round every double column to `scale` decimals. Used by the declared
    * queries so Spark and the DuckDB oracle hash identically despite
    * different floating-point accumulation orders. */
  def roundDoubles(df: DataFrame, scale: Int): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), scale).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Per-column rounding: big-magnitude sums need a coarser grain than
    * means for cross-engine float stability. */
  def roundCols(df: DataFrame, scales: (String, Int)*): DataFrame = {
    val m = scales.toMap
    val cols = df.schema.fields.map { f =>
      m.get(f.name) match {
        case Some(s) => round(col(f.name), s).as(f.name)
        case None => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

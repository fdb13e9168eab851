package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-boundary helpers mirroring the reference's uniform load behavior
  * (`pd_load_dataframe`, /root/reference/_gui.py:203-276): −99 sentinel
  * masking, condition filtering, column-synonym resolution. Internally the
  * engine uses true SQL NULL; −99 exists only at the ingest/egress boundary
  * (SURVEY.md §1.4). */
object Ingest {

  /** Replace the −99 null sentinel with SQL NULL in every numeric column —
    * `df.mask(df == -99)` applied on load unless `keep_null`
    * (/root/reference/_gui.py:269-270, Vulcan convention). */
  def maskSentinel(df: DataFrame, sentinel: Double = -99.0): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType =>
          when(col(f.name) === lit(sentinel).cast(f.dataType), lit(null))
            .otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Inverse boundary op for egress: NULL → −99 in numeric columns. */
  def unmaskSentinel(df: DataFrame, sentinel: Double = -99.0): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType =>
          coalesce(col(f.name), lit(sentinel).cast(f.dataType)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Condition filter: a SQL boolean expression applied right after load
    * (/root/reference/_gui.py:273-275 — pandas `df.query`; Spark SQL
    * expressions are a superset of that grammar). */
  def filterCondition(df: DataFrame, condition: String): DataFrame =
    if (condition == null || condition.trim.isEmpty) df
    else df.filter(expr(condition))

  /** Coordinate-column synonym search (`pd_detect_xyz` + `pd_synonyms`,
    * /root/reference/_gui.py:278-328): candidate triplets tried in order,
    * case-insensitively. Returns the actual column names. */
  val xyzSynonyms: Seq[Seq[String]] = Seq(
    Seq("x", "y", "z"),
    Seq("midx", "midy", "midz"),
    Seq("xc", "yc", "zc"),
    Seq("centroid_x", "centroid_y", "centroid_z"),
    Seq("leste", "norte", "cota"),
    Seq("east", "north", "elevation"))

  def detectXyz(columns: Seq[String]): Option[Seq[String]] = {
    val byLower = columns.map(c => c.toLowerCase -> c).toMap
    xyzSynonyms.iterator
      .map(t => t.flatMap(s => byLower.get(s)))
      .collectFirst { case t if t.length == 3 => t }
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AutoCAD DXF (ASCII) codec, row-encoded like the reference's
  * `pd_load_dxf` (/root/reference/_gui.py:1088-1126): one row per vertex
  * with columns (x, y, z, n, closed, layer, type, mode, entityhandle,
  * text, color). Supported entities: POLYLINE (+VERTEX/SEQEND),
  * LWPOLYLINE (elevation group 38, closed flag 70 bit 0), LINE, POINT,
  * TEXT. `pd_save_dxf` (/root/reference/_gui.py:1128-1155) writes every
  * `n == 0` group back as a 3D POLYLINE — mirrored by [[write]].
  *
  * DXF files here are CAD-side inputs (KB–MB): parsed on the driver,
  * handed to Spark as a DataFrame — same shape as the OBJ/MSH codecs.
  */
object DxfCodec {

  private case class Ent(typ: String, layer: String, handle: String,
      color: Long, closed: Long, mode: String, text: String,
      pts: Seq[(Double, Double, Double)])

  /** Group-code/value pair stream → tag list. */
  private def tags(path: String): Seq[(Int, String)] = {
    val lines = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).split("\r?\n")
    (0 until lines.length - 1 by 2).map { i =>
      (lines(i).trim.toInt, lines(i + 1))
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val ts = tags(path)
    // slice out the ENTITIES section
    val start = ts.indexWhere { case (c, v) => c == 2 && v.trim == "ENTITIES" }
    val entityTags =
      if (start < 0) Seq.empty
      else ts.drop(start + 1).takeWhile { case (c, v) => !(c == 0 && v.trim == "ENDSEC") }
    // split into entities at group code 0
    val chunks = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Int, String)]]
    entityTags.foreach { t =>
      if (t._1 == 0) chunks += mutable.ArrayBuffer(t)
      else if (chunks.nonEmpty) chunks.last += t
    }
    def field(c: mutable.ArrayBuffer[(Int, String)], code: Int, dflt: String): String =
      c.find(_._1 == code).map(_._2.trim).getOrElse(dflt)
    val ents = mutable.ArrayBuffer.empty[Ent]
    var pending: Option[Ent] = None // open POLYLINE collecting VERTEX rows
    chunks.foreach { c =>
      val typ = c.head._2.trim
      val layer = field(c, 8, "0")
      val handle = field(c, 5, "")
      val color = field(c, 62, "256").toLong
      typ match {
        case "POLYLINE" =>
          pending.foreach(ents += _)
          val flags = field(c, 70, "0").toLong
          val mode =
            if ((flags & 8) != 0) "AcDb3dPolyline"
            else if ((flags & 16) != 0) "AcDbPolygonMesh"
            else "AcDb2dPolyline"
          pending = Some(Ent("POLYLINE", layer, handle, color,
            if ((flags & 1) != 0) 1L else 0L, mode, "", Seq.empty))
        case "VERTEX" =>
          pending = pending.map { e =>
            e.copy(pts = e.pts :+ ((field(c, 10, "0").toDouble,
              field(c, 20, "0").toDouble, field(c, 30, "0").toDouble)))
          }
        case "SEQEND" =>
          pending.foreach(ents += _)
          pending = None
        case "LWPOLYLINE" =>
          pending.foreach(ents += _); pending = None
          val z = field(c, 38, "0").toDouble
          val flags = field(c, 70, "0").toLong
          val xs = c.filter(_._1 == 10).map(_._2.trim.toDouble)
          val ys = c.filter(_._1 == 20).map(_._2.trim.toDouble)
          ents += Ent("LWPOLYLINE", layer, handle, color,
            if ((flags & 1) != 0) 1L else 0L, "",
            "", xs.zip(ys).map { case (x, y) => (x, y, z) }.toSeq)
        case "LINE" =>
          pending.foreach(ents += _); pending = None
          ents += Ent("LINE", layer, handle, color, 0L, "", "", Seq(
            (field(c, 10, "0").toDouble, field(c, 20, "0").toDouble, field(c, 30, "0").toDouble),
            (field(c, 11, "0").toDouble, field(c, 21, "0").toDouble, field(c, 31, "0").toDouble)))
        case "POINT" =>
          pending.foreach(ents += _); pending = None
          ents += Ent("POINT", layer, handle, color, 0L, "", "", Seq(
            (field(c, 10, "0").toDouble, field(c, 20, "0").toDouble, field(c, 30, "0").toDouble)))
        case "TEXT" =>
          pending.foreach(ents += _); pending = None
          ents += Ent("TEXT", layer, handle, color, 1L, "", field(c, 1, ""), Seq(
            (field(c, 10, "0").toDouble, field(c, 20, "0").toDouble, field(c, 30, "0").toDouble)))
        case _ => // unsupported entity: skip (viz-only furniture)
          pending.foreach(ents += _); pending = None
      }
    }
    pending.foreach(ents += _)
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType),
      StructField("z", DoubleType), StructField("n", IntegerType),
      StructField("closed", LongType), StructField("layer", StringType),
      StructField("type", StringType), StructField("mode", StringType),
      StructField("entityhandle", StringType), StructField("text", StringType),
      StructField("color", LongType)))
    val rows = ents.flatMap { e =>
      e.pts.zipWithIndex.map { case ((x, y, z), n) =>
        Row(x, y, z, n, e.closed, e.layer, e.typ, e.mode, e.handle, e.text, e.color)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Minimal ASCII DXF: every `n == 0` group becomes a 3D POLYLINE on its
    * row's layer (reference `pd_save_dxf` semantics). */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.columns
    val rows = df.collect()
    val groups = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Row]]
    rows.foreach { r =>
      val n = if (cols.contains("n")) r.getAs[Number]("n").intValue() else 0
      if (n == 0 || groups.isEmpty) groups += mutable.ArrayBuffer(r)
      else groups.last += r
    }
    val sb = new StringBuilder
    def tag(c: Int, v: String): Unit = { sb.append(s"$c\n$v\n") }
    tag(0, "SECTION"); tag(2, "ENTITIES")
    var handle = 256
    groups.foreach { g =>
      val r0 = g.head
      def s(c: String, dflt: String): String =
        if (cols.contains(c) && !r0.isNullAt(r0.fieldIndex(c)))
          r0.get(r0.fieldIndex(c)).toString else dflt
      val closed = s("closed", "0") match { case "1" | "true" => 1 case _ => 0 }
      tag(0, "POLYLINE"); tag(5, handle.toHexString.toUpperCase)
      tag(8, s("layer", "0")); tag(66, "1")
      tag(70, (8 | closed).toString) // 3D polyline (+ closed bit)
      handle += 1
      g.foreach { r =>
        def d(c: String): Double =
          if (cols.contains(c) && !r.isNullAt(r.fieldIndex(c)))
            r.getAs[Number](c).doubleValue() else 0.0
        tag(0, "VERTEX"); tag(5, handle.toHexString.toUpperCase)
        tag(8, s("layer", "0"))
        tag(10, d("x").toString); tag(20, d("y").toString); tag(30, d("z").toString)
        handle += 1
      }
      tag(0, "SEQEND")
    }
    tag(0, "ENDSEC"); tag(0, "EOF")
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}

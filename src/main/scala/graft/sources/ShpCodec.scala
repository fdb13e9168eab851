package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ESRI Shapefile codec (public spec: main .shp geometry + dBASE III .dbf
  * attributes), row-encoded like the reference's `pd_load_shape`
  * (/root/reference/_gui.py:991-1036): one row per vertex with
  * `oid` (record index), `part`, `n` (index within part), `t` (false on
  * the first vertex of a part), `w` = 0, `type` (shape type name), x/y/z,
  * plus one column per .dbf attribute. `pd_save_shape`
  * (/root/reference/_gui.py:1038-1080) groups rows back into records at
  * `n == 0` boundaries and picks the shape class from the `type` column —
  * mirrored by [[write]].
  *
  * Shapefiles in this domain are CAD-side inputs (KB–MB): read on the
  * driver, handed to Spark as a DataFrame — same shape as the OBJ/MSH
  * codecs. Deviation: vertex rows come out in natural part order (the
  * reference iterates parts last-to-first, an artifact of its writer).
  */
object ShpCodec {

  private val TypeNames = Map(
    0 -> "NULL SHAPE", 1 -> "POINT", 3 -> "POLYLINE", 5 -> "POLYGON",
    8 -> "MULTIPOINT", 11 -> "POINTZ", 13 -> "POLYLINEZ", 15 -> "POLYGONZ",
    18 -> "MULTIPOINTZ")

  private case class ShpRecord(oid: Int, typeName: String,
      parts: Array[Int], xs: Array[Double], ys: Array[Double], zs: Array[Double])

  private def readShp(path: String): Seq[ShpRecord] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes)
    bb.order(ByteOrder.BIG_ENDIAN)
    require(bb.getInt(0) == 9994, s"not a shapefile: $path")
    var pos = 100
    val out = mutable.ArrayBuffer.empty[ShpRecord]
    var oid = 0
    while (pos + 8 <= bytes.length) {
      bb.order(ByteOrder.BIG_ENDIAN)
      val contentWords = bb.getInt(pos + 4)
      val content = pos + 8
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val st = bb.getInt(content)
      val name = TypeNames.getOrElse(st, s"TYPE$st")
      st match {
        case 0 => // null shape: no vertices
        case 1 | 11 => // Point / PointZ
          val x = bb.getDouble(content + 4)
          val y = bb.getDouble(content + 12)
          val z = if (st == 11) bb.getDouble(content + 20) else 0.0
          out += ShpRecord(oid, name, Array(0), Array(x), Array(y), Array(z))
        case 8 | 18 => // MultiPoint / MultiPointZ: bbox, numPoints, points
          val n = bb.getInt(content + 36)
          val pts = content + 40
          val xs = Array.tabulate(n)(i => bb.getDouble(pts + 16 * i))
          val ys = Array.tabulate(n)(i => bb.getDouble(pts + 16 * i + 8))
          val zs =
            if (st == 18) {
              val zArr = pts + 16 * n + 16 // skip zmin, zmax
              Array.tabulate(n)(i => bb.getDouble(zArr + 8 * i))
            } else Array.fill(n)(0.0)
          out += ShpRecord(oid, name, Array(0), xs, ys, zs)
        case 3 | 5 | 13 | 15 => // PolyLine/Polygon (+Z): bbox, parts, points
          val nParts = bb.getInt(content + 36)
          val nPts = bb.getInt(content + 40)
          val partsOff = content + 44
          val parts = Array.tabulate(nParts)(i => bb.getInt(partsOff + 4 * i))
          val pts = partsOff + 4 * nParts
          val xs = Array.tabulate(nPts)(i => bb.getDouble(pts + 16 * i))
          val ys = Array.tabulate(nPts)(i => bb.getDouble(pts + 16 * i + 8))
          val zs =
            if (st == 13 || st == 15) {
              val zArr = pts + 16 * nPts + 16 // skip zmin, zmax
              Array.tabulate(nPts)(i => bb.getDouble(zArr + 8 * i))
            } else Array.fill(nPts)(0.0)
          out += ShpRecord(oid, name, if (parts.isEmpty) Array(0) else parts,
            xs, ys, zs)
        case other =>
          throw new UnsupportedOperationException(s"shape type $other in $path")
      }
      pos = content + contentWords * 2
      oid += 1
    }
    out.toSeq
  }

  private case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def readDbf(path: String): (Seq[DbfField], Seq[Seq[Any]]) = {
    if (!Files.exists(Paths.get(path))) return (Nil, Nil)
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recSize = bb.getShort(10) & 0xffff
    val fields = mutable.ArrayBuffer.empty[DbfField]
    var fo = 32
    while (fo + 32 <= headerSize && bytes(fo) != 0x0d) {
      val nameEnd = (fo until fo + 11).find(bytes(_) == 0).getOrElse(fo + 11)
      fields += DbfField(new String(bytes, fo, nameEnd - fo, "ASCII"),
        bytes(fo + 11).toChar, bytes(fo + 16) & 0xff, bytes(fo + 17) & 0xff)
      fo += 32
    }
    val recs = (0 until nRec).map { r =>
      val base = headerSize + r * recSize
      // deletion-flagged records keep their SLOT (all-null attrs): .shp and
      // .dbf records align positionally, so dropping one would shift every
      // later record onto its predecessor's attributes
      if (base + recSize > bytes.length || bytes(base) == '*')
        fields.toSeq.map(_ => null: Any)
      else {
        var off = base + 1
        fields.toSeq.map[Any] { f =>
          val raw = new String(bytes, off, f.len, "ASCII").trim
          off += f.len
          f.typ match {
            case 'N' | 'F' =>
              if (raw.isEmpty) null
              else if (f.dec == 0 && f.typ == 'N') raw.toDouble.toLong
              else raw.toDouble
            case _ => raw
          }
        }
      }
    }
    (fields.toSeq, recs)
  }

  private def dbfPath(shpPath: String): String =
    shpPath.replaceAll("\\.shp$", "") + ".dbf"

  def read(spark: SparkSession, path: String): DataFrame = {
    val recs = readShp(path)
    val (fields, attrs) = readDbf(dbfPath(path))
    val baseNames = Seq("oid", "part", "n", "t", "type", "x", "y", "z", "w")
    // a .dbf field with a base-column name overrides the derived value
    // (reference dict semantics: fields are assigned after the base keys,
    // _gui.py:1016-1020) — e.g. 'oid'/'type' written back by pd_save_shape
    val (overrideFields, extraFields) =
      fields.zipWithIndex.partition { case (f, _) => baseNames.contains(f.name) }
    val attrType: DbfField => DataType = f => f.typ match {
      case 'N' if f.dec == 0 => LongType
      case 'N' | 'F' => DoubleType
      case _ => StringType
    }
    val schema = StructType(
      Seq(StructField("oid", LongType), StructField("part", IntegerType),
        StructField("n", IntegerType), StructField("t", BooleanType),
        StructField("type", StringType), StructField("x", DoubleType),
        StructField("y", DoubleType), StructField("z", DoubleType),
        StructField("w", DoubleType)) ++
      extraFields.map { case (f, _) => StructField(f.name, attrType(f)) })
    val rows = recs.flatMap { rec =>
      val attr: Seq[Any] =
        if (rec.oid < attrs.length) attrs(rec.oid) else fields.map(_ => null)
      val over = overrideFields.flatMap { case (f, i) =>
        Option(attr(i)).map(f.name -> _)
      }.toMap
      def base(name: String, derived: Any): Any = over.getOrElse(name, derived)
      val nPts = rec.xs.length
      rec.parts.indices.flatMap { p =>
        val start = rec.parts(p)
        val end = if (p + 1 < rec.parts.length) rec.parts(p + 1) else nPts
        (start until end).map { i =>
          Row.fromSeq(Seq(
            base("oid", rec.oid.toLong), p, i - start, i != start,
            base("type", rec.typeName).toString,
            rec.xs(i), rec.ys(i), rec.zs(i), 0.0) ++
            extraFields.map { case (_, idx) => attr(idx) })
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Writes .shp/.shx/.dbf. Rows group into one record per `n == 0`
    * boundary (reference semantics); the shape class comes from `type`
    * (contains LINE → PolyLineZ, POINT → PointZ/MultiPointZ, else
    * PolygonZ). Columns other than x/y/z/w/t/n become .dbf attributes
    * (including oid/part/type — the reference does the same). */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.columns
    val geomCols = Set("x", "y", "z", "w", "t", "n")
    val attrCols = cols.filterNot(geomCols.contains)
    val rows = df.collect()
    // group at n == 0 boundaries, preserving row order
    val groups = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Row]]
    rows.foreach { r =>
      val n = if (cols.contains("n")) r.getAs[Number]("n").intValue() else 0
      if (n == 0 || groups.isEmpty) groups += mutable.ArrayBuffer(r)
      else groups.last += r
    }
    def d(r: Row, c: String): Double =
      if (cols.contains(c) && !r.isNullAt(r.fieldIndex(c)))
        r.getAs[Number](c).doubleValue() else 0.0
    val typeOf: Row => String = r =>
      if (cols.contains("type") && !r.isNullAt(r.fieldIndex("type")))
        r.getAs[String]("type") else ""

    val shpBody = ByteBuffer.allocate(
      groups.map(g => 8 + 4 + 40 + 4 + 16 * g.length + 16 + 8 * g.length + 64).sum)
      .order(ByteOrder.BIG_ENDIAN)
    val shxBody = ByteBuffer.allocate(groups.length * 8).order(ByteOrder.BIG_ENDIAN)
    var bounds = Array(Double.MaxValue, Double.MaxValue, Double.MinValue,
      Double.MinValue, Double.MaxValue, Double.MinValue)
    var mainType = 15
    var recNo = 1
    groups.foreach { g =>
      val xs = g.map(d(_, "x")).toArray
      val ys = g.map(d(_, "y")).toArray
      val zs = g.map(d(_, "z")).toArray
      bounds = Array(math.min(bounds(0), xs.min), math.min(bounds(1), ys.min),
        math.max(bounds(2), xs.max), math.max(bounds(3), ys.max),
        math.min(bounds(4), zs.min), math.max(bounds(5), zs.max))
      val t = typeOf(g.head)
      val shapeType =
        if (t.contains("LINE")) 13
        else if (t.contains("POINT")) { if (g.length == 1) 11 else 18 }
        else 15
      if (recNo == 1) mainType = shapeType
      val content = ByteBuffer.allocate(4 + 40 + 4 + 16 * g.length + 16 + 8 * g.length + 64)
        .order(ByteOrder.LITTLE_ENDIAN)
      content.putInt(shapeType)
      if (shapeType == 11) {
        content.putDouble(xs(0)); content.putDouble(ys(0)); content.putDouble(zs(0))
        content.putDouble(0.0) // measure
      } else {
        content.putDouble(xs.min); content.putDouble(ys.min)
        content.putDouble(xs.max); content.putDouble(ys.max)
        if (shapeType != 18) { content.putInt(1); content.putInt(g.length); content.putInt(0) }
        else content.putInt(g.length)
        xs.indices.foreach { i => content.putDouble(xs(i)); content.putDouble(ys(i)) }
        content.putDouble(zs.min); content.putDouble(zs.max)
        zs.foreach(content.putDouble)
      }
      val words = content.position() / 2
      shxBody.putInt((100 + shpBody.position()) / 2)
      shxBody.putInt(words)
      shpBody.putInt(recNo); shpBody.putInt(words)
      shpBody.put(content.array(), 0, content.position())
      recNo += 1
    }
    def header(bodyBytes: Int): ByteBuffer = {
      val h = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      h.putInt(9994); h.position(24); h.putInt((100 + bodyBytes) / 2)
      h.order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(1000); h.putInt(mainType)
      h.putDouble(bounds(0)); h.putDouble(bounds(1))
      h.putDouble(bounds(2)); h.putDouble(bounds(3))
      h.putDouble(bounds(4)); h.putDouble(bounds(5))
      h.putDouble(0.0); h.putDouble(0.0)
      h
    }
    val base = path.replaceAll("\\.shp$", "")
    Files.write(Paths.get(base + ".shp"),
      header(shpBody.position()).array() ++ shpBody.array().take(shpBody.position()))
    Files.write(Paths.get(base + ".shx"),
      header(shxBody.position()).array() ++ shxBody.array().take(shxBody.position()))

    // .dbf: one record per group (attributes of its first row)
    val fieldDefs = attrCols.map { c =>
      df.schema(c).dataType match {
        case LongType | IntegerType | ShortType => DbfField(c.take(10), 'N', 18, 0)
        case DoubleType | FloatType => DbfField(c.take(10), 'N', 18, 4)
        case _ => DbfField(c.take(10), 'C', 64, 0)
      }
    }
    val recSize = 1 + fieldDefs.map(_.len).sum
    val headerSize = 32 + 32 * fieldDefs.length + 1
    val dbf = ByteBuffer.allocate(headerSize + recSize * groups.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0x03.toByte); dbf.put(126.toByte); dbf.put(1.toByte); dbf.put(1.toByte)
    dbf.putInt(groups.length)
    dbf.putShort(headerSize.toShort); dbf.putShort(recSize.toShort)
    dbf.position(32)
    fieldDefs.foreach { f =>
      val pos0 = dbf.position()
      dbf.put(f.name.getBytes("ASCII").take(10))
      dbf.position(pos0 + 11)
      dbf.put(f.typ.toByte)
      dbf.position(pos0 + 16)
      dbf.put(f.len.toByte); dbf.put(f.dec.toByte)
      dbf.position(pos0 + 32)
    }
    dbf.put(0x0d.toByte)
    groups.foreach { g =>
      dbf.put(' '.toByte)
      val r = g.head
      attrCols.zip(fieldDefs).foreach { case (c, f) =>
        val v = if (r.isNullAt(r.fieldIndex(c))) "" else r.get(r.fieldIndex(c))
        val s = (f.typ, v) match {
          case (_, "") => ""
          case ('N', x: Number) if f.dec == 0 => x.longValue().toString
          case ('N', x: Number) => s"%.4f".format(x.doubleValue())
          case (_, x) => x.toString
        }
        val padded =
          if (f.typ == 'N') s.reverse.padTo(f.len, ' ').reverse.takeRight(f.len)
          else s.padTo(f.len, ' ').take(f.len)
        dbf.put(padded.getBytes("ASCII"))
      }
    }
    dbf.put(0x1a.toByte)
    Files.write(Paths.get(base + ".dbf"), dbf.array().take(dbf.position()))
  }
}

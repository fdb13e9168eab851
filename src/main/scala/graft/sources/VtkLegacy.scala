package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{GridSchema, TriMesh}

/** Reader for legacy VTK files (binary and ASCII) — exactly the subset the
  * reference's sample data uses (`pv.read` dispatch,
  * /root/reference/pd_vtk.py:50-87, 533-547; FIXTURES.md):
  *
  *   - `STRUCTURED_GRID` with `DIMENSIONS`/`POINTS` + `CELL_DATA` carrying
  *     `SCALARS` and `FIELD` arrays (numeric and string) → a block-model
  *     table + inferred [[GridSchema]];
  *   - `POLYDATA` with `POINTS` + `POLYGONS` (both the 5.1
  *     OFFSETS/CONNECTIVITY layout and the classic count-prefixed layout)
  *     → [[TriMesh]], polygons fan-triangulated.
  *
  * Binary payloads are big-endian per the VTK spec. Binary string arrays use
  * the observed length-prefix encoding (0xC0 | len for strings < 64 chars —
  * the sample files' `lito` array). VTK is a fixture/ingest format here:
  * meshes are KB-sized and grids are sample-scale; production block models
  * arrive as Parquet. Parsing is driver-side by design.
  */
object VtkLegacy {

  final case class StructuredGrid(
      schema: GridSchema,
      cellData: Seq[(String, Either[Array[Double], Array[String]])]) {

    /** Materialize as a block-model DataFrame: id,i,j,k,x,y,z + variables. */
    def toDf(spark: SparkSession): DataFrame = {
      val g = schema
      val n = g.nCells.toInt
      val fields = mutable.ArrayBuffer(
        StructField("id", LongType), StructField("i", IntegerType),
        StructField("j", IntegerType), StructField("k", IntegerType),
        StructField("x", DoubleType), StructField("y", DoubleType),
        StructField("z", DoubleType))
      cellData.foreach {
        case (nm, Left(_)) => fields += StructField(nm, DoubleType)
        case (nm, Right(_)) => fields += StructField(nm, StringType)
      }
      val rows = (0 until n).map { id =>
        val i = g.i(id); val j = g.j(id); val k = g.k(id)
        val (x, y, z) = g.center(i, j, k)
        val vals: Seq[Any] = Seq[Any](id.toLong, i, j, k, x, y, z) ++
          cellData.map {
            case (_, Left(a)) => a(id)
            case (_, Right(a)) => a(id)
          }
        Row.fromSeq(vals)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq), StructType(fields.toSeq))
    }
  }

  def readMesh(path: String): TriMesh = readMesh(path, meshName(path))

  def meshName(path: String): String = {
    val base = Paths.get(path).getFileName.toString
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  def readMesh(path: String, name: String): TriMesh = {
    val p = new Parser(Files.readAllBytes(Paths.get(path)))
    p.expectHeader()
    require(p.dataset == "POLYDATA", s"expected POLYDATA, got ${p.dataset}")
    val verts = p.readPoints()
    val tris = p.readPolygons()
    TriMesh(name, verts, tris)
  }

  def readGrid(path: String): StructuredGrid = {
    val p = new Parser(Files.readAllBytes(Paths.get(path)))
    p.expectHeader()
    require(p.dataset == "STRUCTURED_GRID",
      s"expected STRUCTURED_GRID, got ${p.dataset}")
    val dims = p.dimensions
    val verts = p.readPoints()
    val schema = inferSchema(dims, verts)
    val nCells = schema.nCells.toInt
    val cellData = p.readCellData(nCells)
    StructuredGrid(schema, cellData)
  }

  /** Infer origin/spacing from the structured points (axis-aligned uniform
    * grids — what the sample data contains; `pd_detect_cell_size` analog,
    * /root/reference/pd_vtk.py:179-200). */
  private def inferSchema(dims: (Int, Int, Int), verts: Array[Double]): GridSchema = {
    val (px, py, pz) = dims
    val ox = verts(0); val oy = verts(1); val oz = verts(2)
    val sx = verts(3) - ox                       // next point along x
    val sy = verts(3 * px + 1) - oy              // next row along y
    val sz = verts(3 * px * py + 2) - oz         // next slab along z
    GridSchema(ox, oy, oz, sx, sy, sz, px - 1, py - 1, pz - 1)
  }

  // ---- low-level parser --------------------------------------------------
  private final class Parser(bytes: Array[Byte]) {
    private var pos = 0
    private var binary = false
    var dataset: String = ""
    var dimensions: (Int, Int, Int) = (0, 0, 0)

    private def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      val s = new String(bytes, start, pos - start, "ISO-8859-1").trim
      if (pos < bytes.length) pos += 1
      s
    }

    private def nextNonEmptyLine(): String = {
      var l = readLine()
      while (l.isEmpty && pos < bytes.length) l = readLine()
      l
    }

    def expectHeader(): Unit = {
      require(readLine().startsWith("# vtk DataFile"), "not a legacy VTK file")
      readLine() // title
      binary = nextNonEmptyLine().equalsIgnoreCase("BINARY")
      val ds = nextNonEmptyLine()
      require(ds.startsWith("DATASET"), s"expected DATASET, got $ds")
      dataset = ds.split("\\s+")(1)
      if (dataset == "STRUCTURED_GRID") {
        val dl = nextNonEmptyLine().split("\\s+")
        require(dl(0) == "DIMENSIONS")
        dimensions = (dl(1).toInt, dl(2).toInt, dl(3).toInt)
      }
    }

    def readPoints(): Array[Double] = {
      var l = nextNonEmptyLine()
      while (!l.startsWith("POINTS")) l = nextNonEmptyLine()
      val parts = l.split("\\s+")
      val n = parts(1).toInt
      readNumeric(n * 3, parts(2))
    }

    /** POLYGONS in either 5.1 (OFFSETS/CONNECTIVITY) or classic layout;
      * fan-triangulates polygons with more than 3 vertices. */
    def readPolygons(): Array[Int] = {
      var l = nextNonEmptyLine()
      while (!l.startsWith("POLYGONS")) l = nextNonEmptyLine()
      val parts = l.split("\\s+")
      val a = parts(1).toInt; val b = parts(2).toInt
      val peek = nextNonEmptyLine()
      val tris = mutable.ArrayBuffer.empty[Int]
      if (peek.startsWith("OFFSETS")) {
        val offT = peek.split("\\s+")(1)
        val offsets = readNumeric(a, offT).map(_.toInt)
        val cl = nextNonEmptyLine()
        require(cl.startsWith("CONNECTIVITY"), s"expected CONNECTIVITY: $cl")
        val conn = readNumeric(b, cl.split("\\s+")(1)).map(_.toInt)
        var c = 0
        while (c < a - 1) {
          val s = offsets(c); val e = offsets(c + 1)
          var v = s + 1
          while (v + 1 < e) { tris += conn(s); tris += conn(v); tris += conn(v + 1); v += 1 }
          c += 1
        }
      } else {
        // classic: `a` polygons, `b` total ints, each poly = count v0 v1 …
        val flat =
          if (binary) readNumericAt(peek, b, "int")
          else {
            val buf = mutable.ArrayBuffer.empty[Int]
            buf ++= peek.split("\\s+").map(_.toInt)
            while (buf.length < b) buf ++= nextNonEmptyLine().split("\\s+").map(_.toInt)
            buf.toArray
          }
        var idx = 0
        while (idx < flat.length) {
          val cnt = flat(idx)
          var v = idx + 2
          while (v + 1 <= idx + cnt) { tris += flat(idx + 1); tris += flat(v); tris += flat(v + 1); v += 1 }
          idx += cnt + 1
        }
      }
      tris.toArray
    }

    private def readNumericAt(firstLine: String, n: Int, typ: String): Array[Int] = {
      // Classic-BINARY POLYGONS is an unsupported layout boundary: `peek`
      // (nextNonEmptyLine) has already consumed past the start of the binary
      // payload, so parsing would need a rewind that is not implemented.
      // ASCII classic works (peek's line is the first data line); the
      // sample/fixture corpus only contains ASCII classic + XML-style binary.
      throw new UnsupportedOperationException(
        "classic binary POLYGONS not present in supported fixtures")
    }

    def readCellData(nCells: Int): Seq[(String, Either[Array[Double], Array[String]])] = {
      val out = mutable.ArrayBuffer.empty[(String, Either[Array[Double], Array[String]])]
      var l = nextNonEmptyLine()
      while (pos < bytes.length || l.nonEmpty) {
        if (l.startsWith("CELL_DATA")) {
          // fall through to section contents
        } else if (l.startsWith("SCALARS")) {
          val p2 = l.split("\\s+")
          val name = p2(1); val typ = p2(2)
          val lookup = nextNonEmptyLine()
          require(lookup.startsWith("LOOKUP_TABLE"), s"expected LOOKUP_TABLE: $lookup")
          out += name -> Left(readNumeric(nCells, typ))
        } else if (l.startsWith("FIELD")) {
          val k = l.split("\\s+")(2).toInt
          var a = 0
          while (a < k) {
            val hd = nextNonEmptyLine().split("\\s+")
            val name = hd(0); val comps = hd(1).toInt; val tuples = hd(2).toInt
            val typ = hd(3)
            if (typ == "string")
              out += name -> Right(readStrings(comps * tuples))
            else
              out += name -> Left(readNumeric(comps * tuples, typ))
            a += 1
          }
        } else if (l.startsWith("POINT_DATA")) {
          return out.toSeq // point data unsupported (samples carry cell data)
        }
        if (pos >= bytes.length) return out.toSeq
        l = nextNonEmptyLine()
        if (l.isEmpty && pos >= bytes.length) return out.toSeq
      }
      out.toSeq
    }

    private def readNumeric(n: Int, typ: String): Array[Double] = {
      if (binary) {
        val bb = ByteBuffer.wrap(bytes, pos, bytes.length - pos)
          .order(ByteOrder.BIG_ENDIAN)
        val out = new Array[Double](n)
        typ match {
          case "double" | "vtktypefloat64" =>
            var i = 0; while (i < n) { out(i) = bb.getDouble; i += 1 }; pos += 8 * n
          case "float" | "vtktypefloat32" =>
            var i = 0; while (i < n) { out(i) = bb.getFloat.toDouble; i += 1 }; pos += 4 * n
          case "int" | "vtktypeint32" =>
            var i = 0; while (i < n) { out(i) = bb.getInt.toDouble; i += 1 }; pos += 4 * n
          case "vtktypeint64" | "long" =>
            var i = 0; while (i < n) { out(i) = bb.getLong.toDouble; i += 1 }; pos += 8 * n
          case "unsigned_char" =>
            var i = 0; while (i < n) { out(i) = (bb.get & 0xFF).toDouble; i += 1 }; pos += n
          case other => throw new UnsupportedOperationException(s"vtk type $other")
        }
        out
      } else {
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          for (tok <- nextNonEmptyLine().split("\\s+") if i < n) {
            out(i) = tok.toDouble; i += 1
          }
        }
        out
      }
    }

    /** Binary string array: each string prefixed by one byte 0xC0|len
      * (observed VTK writer encoding for short strings). ASCII: one string
      * per whitespace token. */
    private def readStrings(n: Int): Array[String] = {
      val out = new Array[String](n)
      if (binary) {
        var i = 0
        while (i < n) {
          val b = bytes(pos) & 0xFF
          require((b & 0xC0) == 0xC0, s"unsupported string length prefix $b")
          val len = b & 0x3F
          out(i) = new String(bytes, pos + 1, len, "UTF-8")
          pos += 1 + len
          i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          for (tok <- nextNonEmptyLine().split("\\s+") if i < n) {
            out(i) = tok; i += 1
          }
        }
      }
      out
    }
  }
}

package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TriMesh

/** Extension-routed mesh reader — the engine's `pv_read` dispatch
  * (/root/reference/pd_vtk.py:50-87): vtk / obj / msh by extension, mesh
  * name = file basename. */
object MeshIO {
  def read(path: String): TriMesh = {
    val lower = path.toLowerCase
    lower.substring(lower.lastIndexOf('.') + 1) match {
      case "vtk" => VtkLegacy.readMesh(path)
      case "obj" => ObjCodec.read(path)
      case "msh" => MshCodec.read(path)
      case "glb" | "gltf" => GltfCodec.read(path)
      case other =>
        throw new IllegalArgumentException(s"unsupported mesh extension: $other")
    }
  }
}

/** Wavefront OBJ codec (`wavefront_load_obj` / `wavefront_save_obj`,
  * /root/reference/_gui.py:1281-1330): `v x y z` vertices, `f i j k …`
  * 1-indexed faces (fan-triangulated when > 3 vertices), `l` polylines. */
object ObjCodec {

  def read(path: String, name: String): TriMesh = {
    val verts = mutable.ArrayBuffer.empty[Double]
    val tris = mutable.ArrayBuffer.empty[Int]
    Files.readAllLines(Paths.get(path)).forEach { line =>
      val c = line.trim.split("\\s+")
      if (c.nonEmpty) c(0) match {
        case "v" => verts ++= c.slice(1, 4).map(_.toDouble)
        case "f" =>
          // indices may carry /vt/vn suffixes; 1-indexed
          val idx = c.drop(1).map(_.split("/")(0).toInt - 1)
          var i = 1
          while (i + 1 < idx.length) {
            tris += idx(0); tris += idx(i); tris += idx(i + 1); i += 1
          }
        case _ =>
      }
    }
    TriMesh(name, verts.toArray, tris.toArray)
  }

  def read(path: String): TriMesh = read(path, VtkLegacy.meshName(path))

  def write(mesh: TriMesh, path: String): Unit = {
    val sb = new StringBuilder
    var v = 0
    while (v < mesh.nVerts) {
      sb ++= s"v ${mesh.verts(3 * v)} ${mesh.verts(3 * v + 1)} ${mesh.verts(3 * v + 2)}\n"
      v += 1
    }
    var t = 0
    while (t < mesh.nTris) {
      sb ++= s"f ${mesh.tris(3 * t) + 1} ${mesh.tris(3 * t + 1) + 1} ${mesh.tris(3 * t + 2) + 1}\n"
      t += 1
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}

/** Leapfrog MSH codec (`leapfrog_load_mesh` / `leapfrog_save_mesh`,
  * /root/reference/_gui.py:1158-1249): `%%ARANZ-1.0` text index section
  * declaring `Tri Integer 3 N` / `Location Double 3 M` arrays, then a
  * `[binary]` section — 12-byte header, int32 faces, float64 vertices,
  * little-endian (native x86 struct packing). */
object MshCodec {

  def read(path: String, name: String): TriMesh = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val marker = "[binary]".getBytes(StandardCharsets.US_ASCII)
    var binStart = -1
    var i = 0
    while (binStart < 0 && i < bytes.length - marker.length) {
      if (bytes.slice(i, i + marker.length).sameElements(marker)) binStart = i + marker.length
      i += 1
    }
    require(binStart > 0, s"no [binary] section in $path")
    val header = new String(bytes, 0, binStart, "ISO-8859-1")
    val decl = raw"(\w+) (\w+) (\d+) ?(\d*);".r
    var nTris = 0; var nVerts = 0
    var order = Vector.empty[String] // declaration order drives binary layout
    decl.findAllMatchIn(header).foreach { m =>
      val (nm, wide, size) = (m.group(1), m.group(3), m.group(4))
      val n = if (size.nonEmpty) size.toInt else wide.toInt
      nm match {
        case "Tri" => nTris = n; order :+= "Tri"
        case "Location" => nVerts = n; order :+= "Location"
        case _ =>
      }
    }
    val bb = ByteBuffer.wrap(bytes, binStart, bytes.length - binStart)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.position(bb.position() + 12) // unknown 12-byte header
    var tris = new Array[Int](3 * nTris)
    var verts = new Array[Double](3 * nVerts)
    order.foreach {
      case "Tri" => var i2 = 0; while (i2 < tris.length) { tris(i2) = bb.getInt; i2 += 1 }
      case "Location" => var i2 = 0; while (i2 < verts.length) { verts(i2) = bb.getDouble; i2 += 1 }
    }
    TriMesh(name, verts, tris)
  }

  def read(path: String): TriMesh = read(path, VtkLegacy.meshName(path))

  def write(mesh: TriMesh, path: String): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    out.write(
      s"%%ARANZ-1.0\n\n[index]\nTri Integer 3 ${mesh.nTris};\nLocation Double 3 ${mesh.nVerts};\n\n[binary]"
        .getBytes(StandardCharsets.US_ASCII))
    val bb = ByteBuffer.allocate(12 + 4 * mesh.tris.length + 8 * mesh.verts.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    // the reference's fixed "unknown header" constants (_gui.py:1242)
    bb.putInt(15732735); bb.putInt(1115938331); bb.putInt(1072939210)
    mesh.tris.foreach(bb.putInt)
    mesh.verts.foreach(bb.putDouble)
    out.write(bb.array())
    out.close()
  }
}

/** The polyline/mesh-in-a-table row encoding — the fixed column convention
  * `x,y,z,w,t,n` + `closed,node` (smartfilelist.default_columns,
  * /root/reference/_gui.py:1565; `nodes_faces_to_df` _gui.py:1211-1225;
  * `df_to_nodes_faces_simple` _gui.py:774-793): one row per face corner,
  * `n` = corner ordinal (0 starts a primitive), `t` = n>0, `node` =
  * shared-vertex id. This is how OBJ/MSH/SHP/DXF geometry becomes rows. */
object MeshRows {

  val schema: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("z", DoubleType), StructField("w", DoubleType),
    StructField("t", IntegerType), StructField("n", IntegerType),
    StructField("closed", IntegerType), StructField("node", IntegerType)))

  def toDf(spark: SparkSession, mesh: TriMesh): DataFrame = {
    val rows = (0 until mesh.nTris).flatMap { f =>
      (0 until 3).map { n =>
        val v = mesh.tris(3 * f + n)
        Row(mesh.verts(3 * v), mesh.verts(3 * v + 1), mesh.verts(3 * v + 2),
          0.0, if (n > 0) 1 else 0, n, 1, v)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  /** Rebuild a TriMesh from row encoding (driver-side collect — meshes are
    * KB-sized dimension geometry, never the fact table). Dedupes vertices by
    * `node` id like df_to_nodes_faces_simple. */
  def fromDf(df: DataFrame, name: String): TriMesh = {
    val rows = df.select("x", "y", "z", "n", "node").collect()
    val nodeXyz = mutable.SortedMap.empty[Int, (Double, Double, Double)]
    rows.foreach { r =>
      nodeXyz(r.getInt(4)) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val ids = nodeXyz.keys.toArray
    val remap = ids.zipWithIndex.toMap
    val verts = ids.flatMap { id =>
      val (x, y, z) = nodeXyz(id); Array(x, y, z)
    }
    val tris = rows.grouped(3).flatMap { g =>
      if (g.length == 3) g.map(r => remap(r.getInt(4))) else Nil
    }.toArray
    TriMesh(name, verts, tris)
  }
}

/** CSV block-model ingestion: coordinate columns by synonym search, grid
  * schema inferred from data — `vtk_Voxel.from_df` + `pd_detect_cell_size`
  * (/root/reference/pd_vtk.py:650-669, 179-200). */
object CsvBlockModel {

  /** Infer per-axis cell size: explicit `xlength/ylength/zlength` columns if
    * present, else the minimum positive delta of the sorted distinct
    * coordinates (computed distributed; the distinct sets of a regular grid
    * are tiny). */
  def inferCellSize(df: DataFrame, xyz: Seq[String]): (Double, Double, Double) = {
    val cols = df.columns.map(_.toLowerCase).toSet
    if (Set("xlength", "ylength", "zlength").subsetOf(cols)) {
      val r = df.select(min("xlength"), min("ylength"), min("zlength")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    } else {
      // min positive delta of the sorted distinct coordinates, computed
      // partition-locally (range-repartition + local sort + per-partition
      // scan, boundary deltas stitched on the driver) — no global
      // single-partition window even if fed a non-grid table
      def axisSize(c: String): Double = {
        val parts = df.select(col(c).cast("double").as("v"))
          .where(col("v").isNotNull).distinct()
          .repartitionByRange(col("v")).sortWithinPartitions("v")
          .rdd.mapPartitionsWithIndex { (pi, it) =>
            var first = Double.NaN; var prev = Double.NaN
            var minD = Double.PositiveInfinity
            it.foreach { r =>
              val v = r.getDouble(0)
              if (first.isNaN) first = v
              else { val d = v - prev; if (d > 1e-9 && d < minD) minD = d }
              prev = v
            }
            if (first.isNaN) Iterator.empty
            else Iterator((pi, first, prev, minD))
          }.collect().sortBy(_._1)
        var minD = parts.foldLeft(Double.PositiveInfinity)((m, p) => math.min(m, p._4))
        for (i <- 1 until parts.length) {
          val d = parts(i)._2 - parts(i - 1)._3
          if (d > 1e-9 && d < minD) minD = d
        }
        if (minD.isInfinite) 10.0 else minD // reference default size
      }
      (axisSize(xyz(0)), axisSize(xyz(1)), axisSize(xyz(2)))
    }
  }

  /** Read a CSV block model: detect xyz columns, infer the grid schema
    * (origin = bbmin − size/2, from_df convention), assign cells. Returns
    * the table with i,j,k appended + the schema. */
  def read(spark: SparkSession, path: String, sep: String = ","): (DataFrame, graft.model.GridSchema) = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .option("sep", sep).csv(path)
    fromPoints(raw)
  }

  def fromPoints(raw: DataFrame): (DataFrame, graft.model.GridSchema) = {
    val xyz = Ingest.detectXyz(raw.columns.toSeq)
      .getOrElse(throw new IllegalArgumentException(
        s"no coordinate columns among ${raw.columns.mkString(",")}"))
    val (sx, sy, sz) = inferCellSize(raw, xyz)
    val bbRow = raw.agg(
      min(col(xyz(0))).cast("double"), max(col(xyz(0))).cast("double"),
      min(col(xyz(1))).cast("double"), max(col(xyz(1))).cast("double"),
      min(col(xyz(2))).cast("double"), max(col(xyz(2))).cast("double")).head()
    val bb = Array(bbRow.getDouble(0), bbRow.getDouble(1), bbRow.getDouble(2),
      bbRow.getDouble(3), bbRow.getDouble(4), bbRow.getDouble(5))
    val g = graft.model.GridSchema.fromPointsBb(bb, sx, sy, sz)
    val df = graft.operators.GridOps.nearestCell(
      raw.withColumn("x", col(xyz(0)).cast("double"))
        .withColumn("y", col(xyz(1)).cast("double"))
        .withColumn("z", col(xyz(2)).cast("double")),
      g)
    (df, g)
  }
}

/** Mesh egress: legacy-VTK ASCII POLYDATA writer (`pv_save` parity for the
  * formats the sample data uses, /root/reference/pd_vtk.py:95-136). */
object VtkWriter {
  def writePolyData(mesh: TriMesh, path: String): Unit = {
    val sb = new StringBuilder
    sb ++= "# vtk DataFile Version 4.2\ngraft mesh\nASCII\nDATASET POLYDATA\n"
    sb ++= s"POINTS ${mesh.nVerts} double\n"
    var v = 0
    while (v < mesh.nVerts) {
      sb ++= s"${mesh.verts(3 * v)} ${mesh.verts(3 * v + 1)} ${mesh.verts(3 * v + 2)}\n"
      v += 1
    }
    sb ++= s"POLYGONS ${mesh.nTris} ${mesh.nTris * 4}\n"
    var t = 0
    while (t < mesh.nTris) {
      sb ++= s"3 ${mesh.tris(3 * t)} ${mesh.tris(3 * t + 1)} ${mesh.tris(3 * t + 2)}\n"
      t += 1
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}

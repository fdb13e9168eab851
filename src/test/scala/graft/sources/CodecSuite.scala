package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest
import graft.model.TriMesh

class CodecSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val box = TriMesh.box("m", 0, 10, 0, 20, 0, 30)

  test("OBJ round-trip preserves geometry") {
    val p = Files.createTempFile("graft", ".obj").toString
    ObjCodec.write(box, p)
    val back = ObjCodec.read(p, "m")
    assert(back.nVerts == box.nVerts && back.nTris == box.nTris)
    assert(back.verts.sameElements(box.verts) && back.tris.sameElements(box.tris))
    assert(back.containsPoint(5, 5, 5) && !back.containsPoint(11, 5, 5))
  }

  test("OBJ fan-triangulates quads") {
    val p = Files.createTempFile("graft", ".obj").toString
    Files.write(java.nio.file.Paths.get(p),
      "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n".getBytes)
    val m = ObjCodec.read(p, "q")
    assert(m.nTris == 2)
  }

  test("MSH (ARANZ) round-trip preserves geometry") {
    val p = Files.createTempFile("graft", ".msh").toString
    MshCodec.write(box, p)
    val back = MshCodec.read(p, "m")
    assert(back.verts.sameElements(box.verts) && back.tris.sameElements(box.tris))
  }

  test("VTK ASCII POLYDATA writer round-trips through the VTK reader") {
    val p = Files.createTempFile("graft", ".vtk").toString
    VtkWriter.writePolyData(box, p)
    val back = VtkLegacy.readMesh(p, "m")
    assert(back.nVerts == 8 && back.nTris == 12)
    assert(back.containsPoint(5, 5, 5))
  }

  test("mesh-rows encoding round-trips (x,y,z,w,t,n,closed,node)") {
    val df = MeshRows.toDf(spark, box)
    assert(df.columns.toSeq == Seq("x", "y", "z", "w", "t", "n", "closed", "node"))
    assert(df.count() == box.nTris * 3)
    // first corner of each primitive has n=0, t=0 (smartfilelist convention)
    assert(df.filter("n = 0 AND t <> 0").count() == 0)
    val back = MeshRows.fromDf(df, "m")
    assert(back.verts.sameElements(box.verts))
    assert(back.containsPoint(5, 5, 5) && !back.containsPoint(-1, 5, 5))
  }

  test("Egress dispatch: tabular and mesh sinks by extension") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_egress").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Egress.save(df, s"$dir/out.csv")
    assert(spark.read.option("header", "true").csv(s"$dir/out.csv").count() == 2)
    Egress.save(df, s"$dir/out.json")
    assert(spark.read.json(s"$dir/out.json").count() == 2)
    Egress.save(MeshRows.toDf(spark, box), s"$dir/mesh.obj")
    assert(ObjCodec.read(s"$dir/mesh.obj").nTris == 12)
    Egress.save(MeshRows.toDf(spark, box), s"$dir/mesh.vtk")
    assert(VtkLegacy.readMesh(s"$dir/mesh.vtk").containsPoint(5, 5, 5))
    Egress.save(df, s"$dir/out.xlsx")
    assert(XlsxCodec.read(spark, s"$dir/out.xlsx").count() == 2)
    intercept[IllegalArgumentException](Egress.save(df, s"$dir/out.tif"))
  }

  test("CSV block model: synonym detection + schema inference + cell assign") {
    import spark.implicits._
    // 3x2x2 grid of cell centers at size 5, with an extra variable
    val rows = for (k <- 0 until 2; j <- 0 until 2; i <- 0 until 3)
      yield (102.5 + 5 * i, 202.5 + 5 * j, 302.5 + 5 * k, i + j + k)
    val csv = Files.createTempFile("graft", ".csv").toString
    val df = rows.toDF("XC", "YC", "ZC", "grade")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(csv + ".d")
    val (out, g) = CsvBlockModel.fromPoints(df)
    assert((g.sx, g.sy, g.sz) == ((5.0, 5.0, 5.0)))
    // from_df convention: origin = bbmin - size/2
    assert((g.ox, g.oy, g.oz) == ((100.0, 200.0, 300.0)))
    assert(out.filter("i < 0").count() == 0)
    assert(out.select("i", "j", "k").distinct().count() == 12)
  }

  test("XLSX round-trip: header, numeric typing, strings, nulls, sheet select") {
    import spark.implicits._
    val df = Seq(
      (1.0, "ore & <high>", Some(2.5)),
      (2.0, "waste", None),
      (3.0, "ore", Some(-0.5)))
      .toDF("id", "lito", "grade")
    val d = Files.createTempDirectory("graft_xlsx").toString
    XlsxCodec.write(df, d + "/t.xlsx", sheet = "blocks")
    val back = XlsxCodec.read(spark, d + "/t.xlsx")
    assert(back.columns.toSeq == Seq("id", "lito", "grade"))
    assert(back.schema("id").dataType.typeName == "double")
    assert(back.schema("lito").dataType.typeName == "string")
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "ore & <high>") // xml escaping round-trips
    assert(rows(1).isNullAt(2)) // missing cell → null
    assert(rows(2).getDouble(2) == -0.5)
    // sheet selection by name via path!sheet
    val named = XlsxCodec.read(spark, d + "/t.xlsx!blocks")
    assert(named.count() == 3)
    intercept[IllegalArgumentException] {
      XlsxCodec.read(spark, d + "/t.xlsx!nope")
    }
    // master dispatch routes .xlsx and applies the condition
    assert(Ingest.load(spark, d + "/t.xlsx", condition = "lito LIKE 'ore%'").count() == 2)
    // numeric-LOOKING string cells keep their type (leading zeros survive)
    val codes = Seq(("0012", 1.0), ("007", 2.0)).toDF("code", "v")
    XlsxCodec.write(codes, d + "/codes.xlsx")
    val codesBack = XlsxCodec.read(spark, d + "/codes.xlsx")
    assert(codesBack.schema("code").dataType.typeName == "string")
    assert(codesBack.orderBy("v").collect().map(_.getString(0)).toSeq ==
      Seq("0012", "007"))
  }

  test("LAS well log: curves to columns, NULL sentinel masked, wrap mode") {
    val las =
      """~Version
        | VERS.  2.0 : version
        | WRAP.  YES : wrapped
        |~Well
        | NULL.  -999.25 : null value
        |~Curve
        | DEPT.M    : depth
        | GR.API    : gamma ray
        | RHOB.G/C3 : density
        |~Params
        |# comment line
        |~ASCII
        | 100.0 45.5
        | 2.31
        | 100.5 -999.25 2.35
        |""".stripMargin
    val d = Files.createTempDirectory("graft_las").toString
    Files.write(java.nio.file.Paths.get(d + "/w.las"), las.getBytes)
    val df = LasCodec.read(spark, d + "/w.las")
    assert(df.columns.toSeq == Seq("DEPT", "GR", "RHOB"))
    val rows = df.orderBy("DEPT").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == 45.5 && rows(0).getDouble(2) == 2.31)
    assert(rows(1).isNullAt(1)) // -999.25 masked
    assert(Ingest.load(spark, d + "/w.las").count() == 2) // dispatch routes
  }

  test("PNG spectral: one row per pixel with channel columns") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val d = Files.createTempDirectory("graft_png").toString
    javax.imageio.ImageIO.write(img, "png", new java.io.File(d + "/i.png"))
    val df = SpectralCodec.read(spark, d + "/i.png")
    assert(df.columns.toSeq == Seq("x", "y", "0", "1", "2"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m((0L, 0L)) == ((255L, 0L, 0L)))   // red pixel at row 0 col 0
    assert(m((1L, 0L)) == ((0L, 0L, 255L)))   // blue at row 1 col 0
    assert(m((1L, 1L)) == ((255L, 255L, 255L)))
    // writer round-trip: rows → png → rows
    SpectralCodec.write(df, d + "/o.png")
    val back = SpectralCodec.read(spark, d + "/o.png")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(back == m)
  }

  test("split mesh egress writes one readable file per mesh") {
    val d = Files.createTempDirectory("graft_split").toString
    val b2 = TriMesh.box("m2", 0, 5, 0, 5, 0, 5)
    Egress.saveMeshesSplit(Seq(box, b2), d, "obj")
    val back1 = ObjCodec.read(d + "/m.obj")
    val back2 = ObjCodec.read(d + "/m2.obj")
    assert(back1.verts.length == box.verts.length)
    assert(back2.verts.length == b2.verts.length)
    assert(back2.containsPoint(2.5, 2.5, 2.5) && !back2.containsPoint(6, 6, 6))
  }

  test("Ingest.load master dispatch: sniffed sep, sentinel mask, condition") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_load").toString
    val f = new java.io.PrintWriter(d + "/t.csv")
    f.write("a;b;lito\n1;-99;ore\n2;5;waste\n3;7;ore\n"); f.close()
    val out = Ingest.load(spark, d + "/t.csv", condition = "lito = 'ore'")
    assert(out.count() == 2) // condition applied
    assert(out.filter("b IS NULL").count() == 1) // -99 masked despite ; sep
    val keep = Ingest.load(spark, d + "/t.csv", keepNull = true)
    assert(keep.filter("b = -99").count() == 1)
    // shp routes through the codec
    val shp = Seq((0.0, 0.0, 1.0, 0, "POLYGONZ")).toDF("x", "y", "z", "n", "type")
    ShpCodec.write(shp, d + "/s.shp")
    assert(Ingest.load(spark, d + "/s.shp").count() == 1)
  }

  test("SHP round-trip: polygon geometry, vertex rows, dbf attributes") {
    import spark.implicits._
    // two polygons (n restarts at 0) with a string + numeric attribute
    val rows = Seq(
      (0.0, 0.0, 1.0, 0, "POLYGONZ", "ore", 1.5),
      (10.0, 0.0, 1.0, 1, "POLYGONZ", "ore", 1.5),
      (10.0, 10.0, 1.0, 2, "POLYGONZ", "ore", 1.5),
      (5.0, 5.0, 2.0, 0, "POLYGONZ", "waste", -0.5),
      (6.0, 5.0, 2.0, 1, "POLYGONZ", "waste", -0.5),
      (6.0, 7.0, 2.0, 2, "POLYGONZ", "waste", -0.5))
      .toDF("x", "y", "z", "n", "type", "lito", "grade")
    val path = Files.createTempDirectory("graft_shp").toString + "/solids.shp"
    ShpCodec.write(rows, path)
    val back = ShpCodec.read(spark, path)
    assert(back.count() == 6)
    assert(back.select("oid").distinct().count() == 2)
    // geometry: exact doubles through the binary format
    val r0 = back.filter("oid = 0 AND n = 2").collect()(0)
    assert(r0.getAs[Double]("x") == 10.0 && r0.getAs[Double]("y") == 10.0 &&
      r0.getAs[Double]("z") == 1.0)
    assert(r0.getAs[Boolean]("t")) // continuation vertex
    assert(back.filter("n = 0 AND t").count() == 0) // part starts have t=false
    // dbf attributes survive with types
    val attrs = back.filter("n = 0").select("lito", "grade")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(attrs == Set(("ore", 1.5), ("waste", -0.5)))
    assert(back.filter("type = 'POLYGONZ'").count() == 6)
  }

  test("SHP point and polyline shape classes") {
    import spark.implicits._
    val pts = Seq((1.0, 2.0, 3.0, 0, "POINTZ"))
      .toDF("x", "y", "z", "n", "type")
    val d = Files.createTempDirectory("graft_shp2").toString
    ShpCodec.write(pts, d + "/p.shp")
    val backP = ShpCodec.read(spark, d + "/p.shp").collect()
    assert(backP.length == 1 && backP(0).getAs[String]("type") == "POINTZ")
    assert(backP(0).getAs[Double]("z") == 3.0)
    val line = Seq((0.0, 0.0, 0.0, 0, "POLYLINEZ"), (4.0, 4.0, 4.0, 1, "POLYLINEZ"))
      .toDF("x", "y", "z", "n", "type")
    ShpCodec.write(line, d + "/l.shp")
    val backL = ShpCodec.read(spark, d + "/l.shp").collect()
    assert(backL.length == 2 && backL.forall(_.getAs[String]("type") == "POLYLINEZ"))
  }

  test("DXF round-trip: polyline vertices, layers, closed flag") {
    import spark.implicits._
    val rows = Seq(
      (0.0, 0.0, 5.0, 0, 1L, "pit"),
      (10.0, 0.0, 5.0, 1, 1L, "pit"),
      (10.0, 10.0, 5.0, 2, 1L, "pit"),
      (50.0, 50.0, 9.0, 0, 0L, "topo"),
      (60.0, 50.0, 9.5, 1, 0L, "topo"))
      .toDF("x", "y", "z", "n", "closed", "layer")
    val path = Files.createTempDirectory("graft_dxf").toString + "/cad.dxf"
    DxfCodec.write(rows, path)
    val back = DxfCodec.read(spark, path)
    assert(back.count() == 5)
    assert(back.select("entityhandle").distinct().count() == 2)
    assert(back.filter("layer = 'pit'").count() == 3)
    assert(back.filter("layer = 'pit' AND closed = 1").count() == 3)
    assert(back.filter("layer = 'topo' AND closed = 0").count() == 2)
    val v = back.filter("layer = 'topo' AND n = 1").collect()(0)
    assert(v.getAs[Double]("x") == 60.0 && v.getAs[Double]("z") == 9.5)
    assert(back.filter("type = 'POLYLINE' AND mode = 'AcDb3dPolyline'").count() == 5)
  }

  test("multi-sheet XLSX: each sheet reads back via path!sheet") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_xlsx_multi").toString
    val summary = Seq(("ore", 120.5), ("waste", 88.25)).toDF("lito", "mass")
    val detail = Seq((1L, "a", 2.0), (2L, "b", 3.5)).toDF("id", "tag", "v")
    val p = d + "/report.xlsx"
    XlsxCodec.writeSheets(Seq("summary" -> summary, "detail" -> detail), p)
    val s = XlsxCodec.read(spark, p + "!summary")
    assert(s.columns.toSeq == Seq("lito", "mass") && s.count() == 2)
    assert(s.filter("lito = 'ore'").collect()(0).getDouble(1) == 120.5)
    val t = XlsxCodec.read(spark, p + "!detail")
    assert(t.columns.toSeq == Seq("id", "tag", "v") && t.count() == 2)
    assert(t.filter("tag = 'b'").collect()(0).getDouble(2) == 3.5)
    // unqualified read → first sheet; unknown sheet → clear error
    assert(XlsxCodec.read(spark, p).columns.toSeq == Seq("lito", "mass"))
    val err = intercept[IllegalArgumentException](XlsxCodec.read(spark, p + "!nope"))
    assert(err.getMessage.contains("summary,detail"))
  }

  test("GLB round-trip matches ObjCodec on the same geometry") {
    val d = Files.createTempDirectory("graft_glb").toString
    GltfCodec.write(box, d + "/m.glb")
    val glb = GltfCodec.read(d + "/m.glb", "m")
    // same geometry through the OBJ codec as the independent reference
    val op = d + "/m.obj"
    ObjCodec.write(box, op)
    val obj = ObjCodec.read(op, "m")
    assert(glb.nVerts == obj.nVerts && glb.nTris == obj.nTris)
    assert(glb.tris.sameElements(obj.tris))
    // GLB stores float32 — compare at that grain
    glb.verts.zip(obj.verts).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5) }
    assert(glb.containsPoint(5, 5, 5) && !glb.containsPoint(11, 5, 5))
    // MeshIO dispatch routes .glb
    assert(MeshIO.read(d + "/m.glb").nTris == box.nTris)
  }

  test("gltf JSON with base64 data-URI buffer decodes") {
    val d = Files.createTempDirectory("graft_gltf").toString
    GltfCodec.write(box, d + "/m.glb")
    // re-wrap the GLB's BIN chunk as a .gltf with an embedded data URI
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d + "/m.glb"))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.getInt; bb.getInt; bb.getInt
    val jsonLen = bb.getInt; bb.getInt
    val jsonChunk = new Array[Byte](jsonLen); bb.get(jsonChunk)
    val binLen = bb.getInt; bb.getInt
    val binChunk = new Array[Byte](binLen); bb.get(binChunk)
    val uri = "data:application/octet-stream;base64," +
      java.util.Base64.getEncoder.encodeToString(binChunk)
    val json = new String(jsonChunk, "UTF-8").replaceAll(
      "\\{\"byteLength\"", s"""{"uri":"$uri","byteLength"""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d + "/m.gltf"), json.getBytes("UTF-8"))
    val m = GltfCodec.read(d + "/m.gltf", "m")
    assert(m.nVerts == box.nVerts && m.nTris == box.nTris)
    assert(m.containsPoint(5, 5, 5))
  }
}

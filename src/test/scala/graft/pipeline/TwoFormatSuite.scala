package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest
import graft.operators.RotatedRectFit
import graft.sources.{CsvBlockModel, ObjCodec, VtkLegacy}

/** The reference's own cross-format oracle: the sample archives hold the
  * SAME dataset as VTK and as CSV, and both ingestion paths must produce
  * identical reports (/root/reference/sample_data/README.md:1-7,
  * FIXTURES.md). The CSV twin archive is 7z (not extractable here), so the
  * CSV side is generated from the decoded VTK grid — same data, the
  * schema-INFERENCE path (from_df conventions) is what's under test. */
class TwoFormatSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val sampleDir = {
    val dir = Files.createTempDirectory("graft_2fmt")
    val zis = new java.util.zip.ZipInputStream(Files.newInputStream(
      java.nio.file.Paths.get("/root/reference/sample_data/std_voxel_vtk.zip")))
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) Files.copy(zis, dir.resolve(e.getName))
      e = zis.getNextEntry
    }
    zis.close()
    dir
  }

  test("csv-ingested (schema-inferred) reserves == vtk-ingested reserves") {
    val spec = "lito;grade,mean,density,volume;density,mean,volume;volume,sum;density=mass,sum,volume"
    val grid = VtkLegacy.readGrid(s"$sampleDir/std_voxel_schema0.vtk")
    val meshes = Seq("vox_region1", "vox_region2", "vox_region3")
      .map(n => VtkLegacy.readMesh(s"$sampleDir/$n.vtk"))
    val up = VtkLegacy.readMesh(s"$sampleDir/vox_mine_up.vtk")
    val down = VtkLegacy.readMesh(s"$sampleDir/vox_mine_down.vtk")

    val vtkReport = Reserves.run(spark, grid.toDf(spark), grid.schema, spec,
      meshes, Seq(up), Seq(down), subBlocks = 5).collect()

    // CSV twin: x,y,z + variables only; grid schema must be re-INFERRED
    val csvData = grid.toDf(spark).select("x", "y", "z", "grade", "lito", "density")
    val (csvDf, inferred) = CsvBlockModel.fromPoints(csvData)
    // from_df convention pads one ring of empty cells; geometry must agree
    assert((inferred.sx, inferred.sy, inferred.sz) == ((50.0, 50.0, 50.0)))
    assert((inferred.ox, inferred.oy, inferred.oz) == ((0.0, 0.0, 0.0)))
    val csvReport = Reserves.run(spark, csvDf, inferred, spec,
      meshes, Seq(up), Seq(down), subBlocks = 5).collect()

    assert(vtkReport.length == csvReport.length)
    vtkReport.zip(csvReport).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getString(1) == b.getString(1))
      for (c <- 2 until 6) {
        assert(a.isNullAt(c) == b.isNullAt(c), s"null mismatch col $c")
        if (!a.isNullAt(c)) {
          val (x, y) = (a.getDouble(c), b.getDouble(c))
          assert((x.isNaN && y.isNaN) || math.abs(x - y) <= math.abs(x) * 1e-12,
            s"col $c: $x vs $y")
        }
      }
    }
  }

  test("OBJ-exported region meshes flag identically to VTK ones") {
    val vtkMesh = VtkLegacy.readMesh(s"$sampleDir/vox_region2.vtk")
    val p = Files.createTempFile("graft", ".obj").toString
    ObjCodec.write(vtkMesh, p)
    val objMesh = ObjCodec.read(p, vtkMesh.name)
    for (xi <- 0 to 10; yi <- 0 to 11; z <- Seq(10.0, 500.0)) {
      val x = 1000.0 + 47.0 * xi; val y = 100.0 + 43.0 * yi
      assert(vtkMesh.containsPoint(x, y, z) == objMesh.containsPoint(x, y, z))
    }
  }
}

class RotatedRectFitSuite extends AnyFunSuite {
  test("axis-aligned rectangle recovers width/height, bearing 90") {
    val pts = (for (i <- 0 to 10; j <- 0 to 4) yield (i * 2.0, j * 3.0)).toArray
    val r = RotatedRectFit.fit(pts)
    assert(math.abs(r.width - 20.0) < 1e-9 && math.abs(r.height - 12.0) < 1e-9)
    assert(math.abs(r.bearingDeg - 90.0) < 1e-6)
    assert(math.abs(r.cx - 10.0) < 1e-9 && math.abs(r.cy - 6.0) < 1e-9)
  }

  test("rotated point cloud recovers its bearing") {
    val a = math.toRadians(30)
    val pts = (for (i <- 0 to 20; j <- 0 to 5) yield {
      val x = i * 1.0; val y = j * 1.0
      (x * math.cos(a) - y * math.sin(a), x * math.sin(a) + y * math.cos(a))
    }).toArray
    val r = RotatedRectFit.fit(pts)
    assert(math.abs(r.width - 20.0) < 1e-6)
    // compass bearing of a +30° math rotation is 90−30 = 60
    assert(math.abs(r.bearingDeg - 60.0) < 1e-6)
  }

  test("rotateMesh spins about the given origin, inverse restores") {
    val box = graft.model.TriMesh.box("b", 10, 20, 30, 40, 0, 5)
    val rot = RotatedRectFit.rotateMesh(box, 45.0, 10, 30)
    val back = RotatedRectFit.rotateMesh(rot, 90.0 - (45.0 - 90.0), 10, 30)
    box.verts.zip(back.verts).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // rotation point is fixed
    assert(math.abs(rot.verts(0) - 10.0) < 1e-9 && math.abs(rot.verts(1) - 30.0) < 1e-9)
  }
}

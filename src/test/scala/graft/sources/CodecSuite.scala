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
    intercept[IllegalArgumentException](Egress.save(df, s"$dir/out.xlsx"))
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
}

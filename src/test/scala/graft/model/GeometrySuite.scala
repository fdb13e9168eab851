package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TriMeshSuite extends AnyFunSuite {
  private val box = TriMesh.box("b", 0, 10, 0, 20, 0, 30)

  test("containsPoint matches analytic box") {
    assert(box.containsPoint(5, 5, 5))
    assert(box.containsPoint(9.99, 19.99, 29.99))
    assert(!box.containsPoint(-0.1, 5, 5))
    assert(!box.containsPoint(5, 20.1, 5))
    assert(!box.containsPoint(5, 5, 30.5))
    assert(!box.containsPoint(50, 50, 50))
  }

  test("containsPoint on a dense sample grid vs analytic predicate") {
    val b = TriMesh.box("b", 1.3, 7.7, 2.1, 8.9, 3.2, 9.8)
    var errs = 0
    for (x <- 0 to 10; y <- 0 to 10; z <- 0 to 10) {
      val px = x + 0.5; val py = y + 0.5; val pz = z + 0.5
      val expected = px > 1.3 && px < 7.7 && py > 2.1 && py < 8.9 && pz > 3.2 && pz < 9.8
      if (b.containsPoint(px, py, pz) != expected) errs += 1
    }
    assert(errs == 0)
  }

  test("surfaceZ: flat quad gives the plane height, NaN off-footprint") {
    val q = TriMesh.quad("q", Array(0, 0, 5, 10, 0, 5, 10, 10, 5, 0, 10, 5))
    assert(math.abs(q.surfaceZ(3.3, 4.4) - 5.0) < 1e-9)
    assert(q.surfaceZ(11.0, 4.4).isNaN)
  }

  test("surfaceZ: sloped plane interpolates") {
    // z = 1 + 0.1x + 0.2y
    val q = TriMesh.quad("q", Array(0, 0, 1, 10, 0, 2, 10, 10, 4, 0, 10, 3))
    assert(math.abs(q.surfaceZ(4.0, 6.0) - (1 + 0.4 + 1.2)) < 1e-9)
  }

  test("BVH handles a mesh with many triangles (tessellated plane)") {
    // 20×20 grid of quads → 800 triangles at z = 7
    val n = 20
    val verts = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (j <- 0 to n; i <- 0 to n) verts ++= Seq(i.toDouble, j.toDouble, 7.0)
    val tris = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (j <- 0 until n; i <- 0 until n) {
      val v0 = j * (n + 1) + i
      tris ++= Seq(v0, v0 + 1, v0 + n + 2, v0, v0 + n + 2, v0 + n + 1)
    }
    val m = TriMesh("plane", verts.toArray, tris.toArray)
    assert(math.abs(m.surfaceZ(10.25, 15.75) - 7.0) < 1e-9)
    assert(m.surfaceZ(20.5, 10.0).isNaN)
  }
}

class GridSchemaSuite extends AnyFunSuite {
  private val g = GridSchema(1000, 2000, 100, 10, 10, 10, 30, 20, 20)

  test("id ↔ ijk round-trip, x-fastest ordering") {
    assert(g.nCells == 12000)
    val id = g.id(3, 4, 5)
    assert(id == 3 + 30 * (4 + 20 * 5))
    assert((g.i(id), g.j(id), g.k(id)) == ((3, 4, 5)))
  }

  test("center ↔ cellAt inverse") {
    val (x, y, z) = g.center(7, 11, 13)
    assert((x, y, z) == ((1075.0, 2115.0, 235.0)))
    assert(g.cellAt(x, y, z) == g.id(7, 11, 13))
    assert(g.cellAt(999.0, 2005.0, 105.0) == -1L)
  }

  test("rotated grid: centers rotate about the point, cellAt inverts") {
    val r = g.copy(bearing = 45.0, rotX = 1000, rotY = 2000)
    val (x, y, z) = r.center(3, 2, 1)
    val (x0, y0, _) = g.center(3, 2, 1)
    // distance from rotation point is preserved
    val d0 = math.hypot(x0 - 1000, y0 - 2000)
    assert(math.abs(math.hypot(x - 1000, y - 2000) - d0) < 1e-9)
    assert(z == 115.0)
    assert(r.cellAt(x, y, z) == r.id(3, 2, 1))
  }

  test("fromBb applies the reference padding (+5 dims, −2 cells origin)") {
    val b = GridSchema.fromBb(Array(0, 100, 0, 50, 0, 30), 10, 10, 10)
    assert((b.nx, b.ny, b.nz) == ((15, 10, 8)))
    assert((b.ox, b.oy, b.oz) == ((-20.0, -20.0, -20.0)))
  }

  test("fromBbSchema parses size;offset;bearing") {
    val s = GridSchema.fromBbSchema(Array(0, 100, 0, 50, 0, 30), "10,10,10;0;45")
    assert(s.bearing == 45.0)
    assert(s.rotated)
    val u = GridSchema.fromBbSchema(Array(0, 100, 0, 50, 0, 30), "10")
    assert((u.sx, u.sy, u.sz) == ((10.0, 10.0, 10.0)))
    assert(!u.rotated)
  }
}

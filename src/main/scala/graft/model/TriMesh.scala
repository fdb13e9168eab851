package graft.model

/** Triangulated surface / closed solid — the engine's geometry IR, the
  * analog of the reference's `pv.PolyData` meshes
  * (/root/reference/pd_vtk.py:229-235). Meshes are KB-sized (region solids,
  * topo/pit surfaces) while the block model is the big side, so every
  * spatial operator broadcasts a TriMesh and evaluates per-row — no shuffle
  * (SURVEY.md §2.5 scale analysis).
  *
  * Kernels:
  *   - [[containsPoint]] — ray-crossing parity test, the analog of VTK
  *     `select_enclosed_points` (/root/reference/vtk_flag_regions.py:66);
  *   - [[surfaceZ]] — vertical-ray elevation, mean of hits, the analog of
  *     `get_elevation` / `Raytracer._raytrace_z`
  *     (/root/reference/pd_vtk.py:771-796, 1206-1221).
  *
  * A BVH over triangle AABBs accelerates both; it is rebuilt lazily on each
  * executor after broadcast (@transient) instead of being serialized.
  */
final case class TriMesh(name: String, verts: Array[Double], tris: Array[Int])
    extends Serializable {

  def nVerts: Int = verts.length / 3
  def nTris: Int = tris.length / 3

  /** xmin,xmax,ymin,ymax,zmin,zmax (VTK bounds order). */
  @transient lazy val bounds: Array[Double] = {
    val b = Array(Double.MaxValue, Double.MinValue, Double.MaxValue,
      Double.MinValue, Double.MaxValue, Double.MinValue)
    var i = 0
    while (i < verts.length) {
      val x = verts(i); val y = verts(i + 1); val z = verts(i + 2)
      if (x < b(0)) b(0) = x; if (x > b(1)) b(1) = x
      if (y < b(2)) b(2) = y; if (y > b(3)) b(3) = y
      if (z < b(4)) b(4) = z; if (z > b(5)) b(5) = z
      i += 3
    }
    b
  }

  // ---- BVH ----------------------------------------------------------------
  // Flat-array BVH: median split on the longest axis, leaves ≤ 4 triangles.
  // nodeBox(6*n..), nodeInfo(2*n) = (leftChild | ~firstTri, count) packed.
  @transient private lazy val bvh: Bvh = Bvh.build(this)

  /** All ray-hit parameters t ≥ tMin along origin + t·dir (unsorted). */
  def rayHits(ox: Double, oy: Double, oz: Double,
      dx: Double, dy: Double, dz: Double, tMin: Double): Array[Double] =
    bvh.rayHits(this, ox, oy, oz, dx, dy, dz, tMin)

  /** Point-in-solid parity test. The ray direction is a fixed, slightly
    * irregular unit vector so axis-aligned faces are never hit edge-on. */
  def containsPoint(x: Double, y: Double, z: Double): Boolean = {
    val b = bounds
    if (x < b(0) || x > b(1) || y < b(2) || y > b(3) || z < b(4) || z > b(5))
      return false
    val hits = rayHits(x, y, z, TriMesh.RayDx, TriMesh.RayDy, TriMesh.RayDz, 1e-12)
    (hits.length & 1) == 1
  }

  /** Elevation of the mesh above (x,y): mean z of all vertical-ray hits,
    * NaN when the column misses the mesh (pd_vtk.py:771-796 semantics). */
  def surfaceZ(x: Double, y: Double): Double = {
    val b = bounds
    if (x < b(0) || x > b(1) || y < b(2) || y > b(3)) return Double.NaN
    val z0 = b(4) - 1.0
    val hits = rayHits(x, y, z0, 0.0, 0.0, 1.0, 0.0)
    if (hits.isEmpty) Double.NaN
    else {
      var s = 0.0; var i = 0
      while (i < hits.length) { s += z0 + hits(i); i += 1 }
      s / hits.length
    }
  }

  /** True when a vertical line through (x,y) hits the mesh — the 2D
    * footprint test of `vtk_flag_region_2d`
    * (/root/reference/vtk_flag_regions.py:28-52). */
  def underFootprint(x: Double, y: Double): Boolean = !surfaceZ(x, y).isNaN

  /** Möller–Trumbore ray/triangle intersection; returns t or NaN. */
  private[model] def rayTri(ti: Int, ox: Double, oy: Double, oz: Double,
      dx: Double, dy: Double, dz: Double): Double = {
    val a = tris(3 * ti) * 3; val b = tris(3 * ti + 1) * 3; val c = tris(3 * ti + 2) * 3
    val e1x = verts(b) - verts(a); val e1y = verts(b + 1) - verts(a + 1); val e1z = verts(b + 2) - verts(a + 2)
    val e2x = verts(c) - verts(a); val e2y = verts(c + 1) - verts(a + 1); val e2z = verts(c + 2) - verts(a + 2)
    val px = dy * e2z - dz * e2y
    val py = dz * e2x - dx * e2z
    val pz = dx * e2y - dy * e2x
    val det = e1x * px + e1y * py + e1z * pz
    if (math.abs(det) < 1e-14) return Double.NaN
    val inv = 1.0 / det
    val tx = ox - verts(a); val ty = oy - verts(a + 1); val tz = oz - verts(a + 2)
    val u = (tx * px + ty * py + tz * pz) * inv
    if (u < -1e-12 || u > 1 + 1e-12) return Double.NaN
    val qx = ty * e1z - tz * e1y
    val qy = tz * e1x - tx * e1z
    val qz = tx * e1y - ty * e1x
    val v = (dx * qx + dy * qy + dz * qz) * inv
    if (v < -1e-12 || u + v > 1 + 1e-12) return Double.NaN
    (e2x * qx + e2y * qy + e2z * qz) * inv
  }
}

object TriMesh {
  // fixed quasi-random parity-ray direction (unit-ish; exactness irrelevant)
  val RayDx = 0.0012345
  val RayDy = 0.0023456
  val RayDz = 1.0

  /** Axis-aligned box solid as 12 triangles — the shape of the sample
    * region solids (vox_region*.vtk, FIXTURES.md §2). */
  def box(name: String, x0: Double, x1: Double, y0: Double, y1: Double,
      z0: Double, z1: Double): TriMesh = {
    val v = Array(
      x0, y0, z0, x1, y0, z0, x1, y1, z0, x0, y1, z0, // bottom 0-3
      x0, y0, z1, x1, y0, z1, x1, y1, z1, x0, y1, z1) // top 4-7
    val t = Array(
      0, 2, 1, 0, 3, 2, // bottom
      4, 5, 6, 4, 6, 7, // top
      0, 1, 5, 0, 5, 4, // y0 side
      2, 3, 7, 2, 7, 6, // y1 side
      1, 2, 6, 1, 6, 5, // x1 side
      3, 0, 4, 3, 4, 7) // x0 side
    TriMesh(name, v, t)
  }

  /** Planar quad surface (two triangles) through four points — the shape of
    * the sample mine surfaces (vox_mine_up/down.vtk, FIXTURES.md §3). */
  def quad(name: String, p: Array[Double]): TriMesh = {
    require(p.length == 12, "quad needs 4 xyz points")
    TriMesh(name, p, Array(0, 1, 2, 0, 2, 3))
  }
}

/** Flat-array median-split BVH. Build cost O(n log n) on first use per
  * executor; queries prune by slab test. */
private[model] final class Bvh(
    val boxes: Array[Double],   // 6 per node: xmin,xmax,ymin,ymax,zmin,zmax
    val info: Array[Int],       // 2 per node: (leftChild or ~firstTriSlot, triCount or 0)
    val order: Array[Int]) {    // triangle indices, leaves reference slots here

  def rayHits(m: TriMesh, ox: Double, oy: Double, oz: Double,
      dx: Double, dy: Double, dz: Double, tMin: Double): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stack = new Array[Int](64)
    var sp = 0
    stack(sp) = 0; sp += 1
    while (sp > 0) {
      sp -= 1
      val n = stack(sp)
      if (slabHit(n, ox, oy, oz, dx, dy, dz)) {
        val a = info(2 * n); val cnt = info(2 * n + 1)
        if (cnt > 0) { // leaf
          val first = ~a
          var s = 0
          while (s < cnt) {
            val t = m.rayTri(order(first + s), ox, oy, oz, dx, dy, dz)
            if (!t.isNaN && t >= tMin) out += t
            s += 1
          }
        } else {
          stack(sp) = a; sp += 1
          stack(sp) = a + 1; sp += 1
        }
      }
    }
    out.toArray
  }

  private def slabHit(n: Int, ox: Double, oy: Double, oz: Double,
      dx: Double, dy: Double, dz: Double): Boolean = {
    val o = 6 * n
    var t0 = 0.0
    var t1 = Double.MaxValue
    var ax = 0
    while (ax < 3) {
      val lo = boxes(o + 2 * ax); val hi = boxes(o + 2 * ax + 1)
      val oc = ax match { case 0 => ox; case 1 => oy; case _ => oz }
      val dc = ax match { case 0 => dx; case 1 => dy; case _ => dz }
      if (math.abs(dc) < 1e-300) {
        if (oc < lo - 1e-9 || oc > hi + 1e-9) return false
      } else {
        val inv = 1.0 / dc
        var ta = (lo - oc) * inv
        var tb = (hi - oc) * inv
        if (ta > tb) { val tmp = ta; ta = tb; tb = tmp }
        if (ta > t0) t0 = ta
        if (tb < t1) t1 = tb
        if (t0 > t1 + 1e-9) return false
      }
      ax += 1
    }
    true
  }
}

private[model] object Bvh {
  def build(m: TriMesh): Bvh = {
    val n = m.nTris
    val cent = new Array[Double](3 * n)
    val triBox = new Array[Double](6 * n)
    var t = 0
    while (t < n) {
      var ax = 0
      while (ax < 3) {
        val a = m.verts(m.tris(3 * t) * 3 + ax)
        val b = m.verts(m.tris(3 * t + 1) * 3 + ax)
        val c = m.verts(m.tris(3 * t + 2) * 3 + ax)
        triBox(6 * t + 2 * ax) = math.min(a, math.min(b, c))
        triBox(6 * t + 2 * ax + 1) = math.max(a, math.max(b, c))
        cent(3 * t + ax) = (a + b + c) / 3.0
        ax += 1
      }
      t += 1
    }
    val order = Array.range(0, n)
    val boxes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val info = scala.collection.mutable.ArrayBuffer.empty[Int]

    def nodeBox(first: Int, cnt: Int): Array[Double] = {
      val b = Array(Double.MaxValue, Double.MinValue, Double.MaxValue,
        Double.MinValue, Double.MaxValue, Double.MinValue)
      var s = first
      while (s < first + cnt) {
        val ti = order(s)
        var ax = 0
        while (ax < 3) {
          if (triBox(6 * ti + 2 * ax) < b(2 * ax)) b(2 * ax) = triBox(6 * ti + 2 * ax)
          if (triBox(6 * ti + 2 * ax + 1) > b(2 * ax + 1)) b(2 * ax + 1) = triBox(6 * ti + 2 * ax + 1)
          ax += 1
        }
        s += 1
      }
      b
    }

    // breadth-first build so children are allocated contiguously (a, a+1)
    final case class Pending(node: Int, first: Int, cnt: Int)
    val queue = scala.collection.mutable.Queue.empty[Pending]

    def alloc(): Int = {
      boxes ++= Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      info ++= Seq(0, 0)
      boxes.length / 6 - 1
    }

    val root = alloc()
    queue.enqueue(Pending(root, 0, n))
    while (queue.nonEmpty) {
      val Pending(node, first, cnt) = queue.dequeue()
      val b = nodeBox(first, cnt)
      var ax = 0
      while (ax < 3) {
        boxes(6 * node + 2 * ax) = b(2 * ax)
        boxes(6 * node + 2 * ax + 1) = b(2 * ax + 1)
        ax += 1
      }
      if (cnt <= 4) {
        info(2 * node) = ~first
        info(2 * node + 1) = cnt
      } else {
        // longest axis of the centroid extent
        var bestAx = 0; var bestExt = -1.0
        var a2 = 0
        while (a2 < 3) {
          var lo = Double.MaxValue; var hi = Double.MinValue
          var s = first
          while (s < first + cnt) {
            val c = cent(3 * order(s) + a2)
            if (c < lo) lo = c; if (c > hi) hi = c
            s += 1
          }
          if (hi - lo > bestExt) { bestExt = hi - lo; bestAx = a2 }
          a2 += 1
        }
        val sorted = order.slice(first, first + cnt).sortBy(ti => cent(3 * ti + bestAx))
        System.arraycopy(sorted, 0, order, first, cnt)
        val mid = cnt / 2
        val l = alloc(); val r = alloc()
        require(r == l + 1)
        info(2 * node) = l
        info(2 * node + 1) = 0
        queue.enqueue(Pending(l, first, mid))
        queue.enqueue(Pending(r, first + mid, cnt - mid))
      }
    }
    new Bvh(boxes.toArray, info.toArray, order)
  }
}

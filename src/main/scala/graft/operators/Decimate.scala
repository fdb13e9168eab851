package graft.operators

import scala.collection.mutable

import graft.model.TriMesh

/** Triangle-mesh decimation — the engine's `tri_decimate`
  * (/root/reference/tri_decimate.py:31-60, which calls VTK
  * `decimate_pro`). Same contract: `targetReduction` is the fraction of
  * faces to remove (0.5 → half the triangles).
  *
  * Algorithm: quadric error metrics (Garland–Heckbert) with subset
  * placement — each vertex carries the sum of squared-distance quadrics of
  * its incident face planes; edges collapse cheapest-first into whichever
  * of (v1, v2, midpoint) minimizes the summed quadric; collapses that
  * would flip a surviving face's orientation are rejected. This is the
  * standard public construction (used by MeshLab/VTK alike), not a
  * transcription of any engine.
  *
  * Runs on the driver like the mesh codecs: decimation feeds egress of
  * KB–MB viz meshes, not a fact-table path. */
object Decimate {

  def apply(mesh: TriMesh, targetReduction: Double): TriMesh = {
    require(targetReduction >= 0 && targetReduction < 1,
      s"targetReduction must be in [0, 1): $targetReduction")
    if (targetReduction == 0 || mesh.nTris == 0) return mesh
    val targetFaces = math.max(1, math.ceil(mesh.nTris * (1 - targetReduction)).toInt)

    val nv = mesh.nVerts
    val vx = Array.tabulate(nv)(i => mesh.verts(3 * i))
    val vy = Array.tabulate(nv)(i => mesh.verts(3 * i + 1))
    val vz = Array.tabulate(nv)(i => mesh.verts(3 * i + 2))
    // union-find over collapsed vertices
    val parent = Array.tabulate(nv)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }

    // live faces as vertex triples (indices into the union-find)
    val faces = mutable.ArrayBuffer.empty[Array[Int]]
    (0 until mesh.nTris).foreach { t =>
      faces += Array(mesh.tris(3 * t), mesh.tris(3 * t + 1), mesh.tris(3 * t + 2))
    }

    // 4×4 symmetric quadric per vertex, stored as 10 upper-triangle terms
    // (a²,ab,ac,ad, b²,bc,bd, c²,cd, d²) of the plane (a,b,c,d)
    val q = Array.fill(nv)(new Array[Double](10))
    def addPlaneQuadric(vi: Int, a: Double, b: Double, c: Double, d: Double): Unit = {
      val m = q(vi)
      m(0) += a * a; m(1) += a * b; m(2) += a * c; m(3) += a * d
      m(4) += b * b; m(5) += b * c; m(6) += b * d
      m(7) += c * c; m(8) += c * d; m(9) += d * d
    }
    def facePlane(f: Array[Int]): Option[(Double, Double, Double, Double, Double)] = {
      val (i, j, k) = (f(0), f(1), f(2))
      val ux = vx(j) - vx(i); val uy = vy(j) - vy(i); val uz = vz(j) - vz(i)
      val wx = vx(k) - vx(i); val wy = vy(k) - vy(i); val wz = vz(k) - vz(i)
      val nx = uy * wz - uz * wy
      val ny = uz * wx - ux * wz
      val nz = ux * wy - uy * wx
      val len = math.sqrt(nx * nx + ny * ny + nz * nz)
      if (len < 1e-30) None
      else {
        val (a, b, c) = (nx / len, ny / len, nz / len)
        Some((a, b, c, -(a * vx(i) + b * vy(i) + c * vz(i)), len))
      }
    }
    faces.foreach { f =>
      facePlane(f).foreach { case (a, b, c, d, _) =>
        f.foreach(addPlaneQuadric(_, a, b, c, d))
      }
    }
    // boundary preservation (Garland–Heckbert §6): an edge on exactly one
    // face gets a high-weight quadric of the plane through the edge,
    // perpendicular to that face — otherwise open boundaries erode inward
    locally {
      val edgeFace = mutable.Map.empty[(Int, Int), List[Int]]
      faces.zipWithIndex.foreach { case (f, fi) =>
        Seq((f(0), f(1)), (f(1), f(2)), (f(2), f(0))).foreach { case (a, b) =>
          val k = (math.min(a, b), math.max(a, b))
          edgeFace(k) = fi :: edgeFace.getOrElse(k, Nil)
        }
      }
      val BoundaryWeight = 1000.0
      edgeFace.foreach { case ((i, j), fis) =>
        if (fis.length == 1) facePlane(faces(fis.head)).foreach {
          case (fa, fb, fc, _, _) =>
            val ex = vx(j) - vx(i); val ey = vy(j) - vy(i); val ez = vz(j) - vz(i)
            // perpendicular plane normal = edge × face-normal
            var px = ey * fc - ez * fb
            var py = ez * fa - ex * fc
            var pz = ex * fb - ey * fa
            val len = math.sqrt(px * px + py * py + pz * pz)
            if (len > 1e-30) {
              px /= len; py /= len; pz /= len
              val d = -(px * vx(i) + py * vy(i) + pz * vz(i))
              val w = math.sqrt(BoundaryWeight)
              Seq(i, j).foreach(addPlaneQuadric(_, w * px, w * py, w * pz, w * d))
            }
        }
      }
    }
    def quadricError(m: Array[Double], x: Double, y: Double, z: Double): Double =
      m(0) * x * x + 2 * m(1) * x * y + 2 * m(2) * x * z + 2 * m(3) * x +
        m(4) * y * y + 2 * m(5) * y * z + 2 * m(6) * y +
        m(7) * z * z + 2 * m(8) * z + m(9)

    // candidate edges from live faces; STALE entries (an endpoint moved or
    // merged after push) are detected by version stamps on pop and
    // re-enqueued with fresh error/placement instead of executing
    val version = new Array[Int](nv)
    case class Cand(err: Double, u: Int, v: Int, vu: Int, vv: Int,
        px: Double, py: Double, pz: Double)
    implicit val ord: Ordering[Cand] = Ordering.by[Cand, Double](_.err).reverse
    val heap = mutable.PriorityQueue.empty[Cand]
    def pushEdge(u0: Int, v0: Int): Unit = {
      val u = find(u0); val v = find(v0)
      if (u == v) return
      val m = new Array[Double](10)
      var i = 0
      while (i < 10) { m(i) = q(u)(i) + q(v)(i); i += 1 }
      // subset placement: v1, v2 or midpoint, whichever is cheapest
      val mx = (vx(u) + vx(v)) / 2; val my = (vy(u) + vy(v)) / 2
      val mz = (vz(u) + vz(v)) / 2
      val cands = Seq(
        (quadricError(m, vx(u), vy(u), vz(u)), vx(u), vy(u), vz(u)),
        (quadricError(m, vx(v), vy(v), vz(v)), vx(v), vy(v), vz(v)),
        (quadricError(m, mx, my, mz), mx, my, mz))
      val best = cands.minBy(_._1)
      heap.enqueue(Cand(best._1, u, v, version(u), version(v),
        best._2, best._3, best._4))
    }
    faces.foreach { f =>
      pushEdge(f(0), f(1)); pushEdge(f(1), f(2)); pushEdge(f(2), f(0))
    }

    val vertFaces = Array.fill(nv)(mutable.Set.empty[Int])
    faces.zipWithIndex.foreach { case (f, fi) => f.foreach(vertFaces(_) += fi) }
    val faceDead = new Array[Boolean](faces.length)
    var liveFaces = faces.length

    def wouldFlip(fi: Int, from: Int, x: Double, y: Double, z: Double): Boolean = {
      // compare face normal before and after moving `from` to (x,y,z)
      val f = faces(fi).map(find)
      facePlane(f) match {
        case None => false
        case Some((a, b, c, _, _)) =>
          val sx = Array(vx(f(0)), vx(f(1)), vx(f(2)))
          val sy = Array(vy(f(0)), vy(f(1)), vy(f(2)))
          val sz = Array(vz(f(0)), vz(f(1)), vz(f(2)))
          (0 to 2).foreach { i =>
            if (f(i) == from) { sx(i) = x; sy(i) = y; sz(i) = z }
          }
          val ux = sx(1) - sx(0); val uy = sy(1) - sy(0); val uz = sz(1) - sz(0)
          val wx = sx(2) - sx(0); val wy = sy(2) - sy(0); val wz = sz(2) - sz(0)
          val nx2 = uy * wz - uz * wy
          val ny2 = uz * wx - ux * wz
          val nz2 = ux * wy - uy * wx
          a * nx2 + b * ny2 + c * nz2 < 0 // orientation reversed
      }
    }

    while (liveFaces > targetFaces && heap.nonEmpty) {
      val c = heap.dequeue()
      val u = find(c.u); val v = find(c.v)
      if (u != v && (version(u) != c.vu || version(v) != c.vv)) {
        // a neighboring collapse moved an endpoint since this candidate
        // was scored — re-enqueue with current geometry, don't execute
        pushEdge(u, v)
      } else if (u != v) {
        // collapse v into u at the candidate position, unless a surviving
        // incident face would flip
        val affected = (vertFaces(u) ++ vertFaces(v)).filterNot(faceDead)
        val (dying, surviving) = affected.partition { fi =>
          val f = faces(fi).map(find)
          f.count(r => r == u || r == v) >= 2
        }
        val flips = surviving.exists { fi =>
          wouldFlip(fi, u, c.px, c.py, c.pz) || wouldFlip(fi, v, c.px, c.py, c.pz)
        }
        if (!flips && liveFaces - dying.size >= targetFaces) {
          parent(v) = u
          version(u) += 1 // invalidate every queued candidate touching u
          vx(u) = c.px; vy(u) = c.py; vz(u) = c.pz
          var i = 0
          while (i < 10) { q(u)(i) += q(v)(i); i += 1 }
          dying.foreach { fi =>
            if (!faceDead(fi)) { faceDead(fi) = true; liveFaces -= 1 }
          }
          surviving.foreach { fi => vertFaces(u) += fi }
          vertFaces(v).clear()
          // refresh candidate edges around the merged vertex
          surviving.foreach { fi =>
            val f = faces(fi).map(find)
            pushEdge(f(0), f(1)); pushEdge(f(1), f(2)); pushEdge(f(2), f(0))
          }
        }
      }
    }

    // compact surviving vertices and faces
    val remap = mutable.Map.empty[Int, Int]
    val outVerts = mutable.ArrayBuffer.empty[Double]
    val outTris = mutable.ArrayBuffer.empty[Int]
    faces.zipWithIndex.foreach { case (f0, fi) =>
      if (!faceDead(fi)) {
        val f = f0.map(find)
        if (f.distinct.length == 3) {
          f.foreach { r =>
            if (!remap.contains(r)) {
              remap(r) = remap.size
              outVerts += vx(r) += vy(r) += vz(r)
            }
          }
          outTris += remap(f(0)) += remap(f(1)) += remap(f(2))
        }
      }
    }
    TriMesh(mesh.name, outVerts.toArray, outTris.toArray)
  }
}

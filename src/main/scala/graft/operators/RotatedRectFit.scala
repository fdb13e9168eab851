package graft.operators

import graft.model.TriMesh

/** Minimum rotated rectangle fit over xy points — rotating calipers on the
  * convex hull (`pd_detect_rr` / `getRectangleSchema`,
  * /root/reference/_gui.py:1346-1401; `vtk_Voxel.from_rr`
  * pd_vtk.py:705-724). Driver-side Scala over the collected DISTINCT xy set
  * (grids have tiny distinct footprints; the caller is responsible for
  * distinct-ing/sampling a huge point cloud first — SURVEY.md §2.5). */
object RotatedRectFit {

  final case class Rect(cx: Double, cy: Double, width: Double, height: Double,
      bearingDeg: Double)

  def fit(pts: Array[(Double, Double)]): Rect = {
    val hull = convexHull(pts.distinct)
    require(hull.length >= 2, "need at least 2 distinct points")
    var best: Rect = null
    var bestArea = Double.MaxValue
    var e = 0
    while (e < hull.length) {
      val (x0, y0) = hull(e)
      val (x1, y1) = hull((e + 1) % hull.length)
      val len = math.hypot(x1 - x0, y1 - y0)
      if (len > 1e-12) {
        val ux = (x1 - x0) / len; val uy = (y1 - y0) / len
        var minU = Double.MaxValue; var maxU = Double.MinValue
        var minV = Double.MaxValue; var maxV = Double.MinValue
        hull.foreach { case (px, py) =>
          val u = (px - x0) * ux + (py - y0) * uy
          val v = -(px - x0) * uy + (py - y0) * ux
          if (u < minU) minU = u; if (u > maxU) maxU = u
          if (v < minV) minV = v; if (v > maxV) maxV = v
        }
        val area = (maxU - minU) * (maxV - minV)
        if (area < bestArea) {
          bestArea = area
          val cu = (minU + maxU) / 2; val cv = (minV + maxV) / 2
          val cx = x0 + cu * ux - cv * uy
          val cy = y0 + cu * uy + cv * ux
          // bearing: compass angle of the rect's long axis (north = 0)
          val (ax, ay) =
            if (maxU - minU >= maxV - minV) (ux, uy) else (-uy, ux)
          val bearing = (math.toDegrees(math.atan2(ax, ay)) + 360) % 180
          best = Rect(cx, cy, maxU - minU, maxV - minV, bearing)
        }
      }
      e += 1
    }
    best
  }

  /** Andrew monotone-chain convex hull (counter-clockwise). */
  private[operators] def convexHull(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    val s = pts.sortBy(p => (p._1, p._2))
    if (s.length <= 2) return s
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    s.foreach { p =>
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    s.reverseIterator.foreach { p =>
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }

  /** Rotate a mesh about z at a point by −(bearing−90)° — mesh_rotate_0261
    * (/root/reference/pd_vtk.py:500-520). */
  def rotateMesh(mesh: TriMesh, bearingDeg: Double, ox: Double, oy: Double): TriMesh = {
    val a = math.toRadians(-(bearingDeg - 90.0))
    val c = math.cos(a); val s = math.sin(a)
    val out = new Array[Double](mesh.verts.length)
    var i = 0
    while (i < mesh.verts.length) {
      val dx = mesh.verts(i) - ox; val dy = mesh.verts(i + 1) - oy
      out(i) = ox + c * dx - s * dy
      out(i + 1) = oy + s * dx + c * dy
      out(i + 2) = mesh.verts(i + 2)
      i += 3
    }
    TriMesh(mesh.name, out, mesh.tris)
  }
}

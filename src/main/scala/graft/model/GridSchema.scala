package graft.model

/** Geometry of a regular block-model grid — the analog of the reference's
  * `vtk_Voxel` metadata (origin / spacing / dims / bearing kept as
  * field-data, /root/reference/pd_vtk.py:525-530, 568-579). Cells live on an
  * integer (i,j,k) lattice; world coordinates are materialized by
  * [[center]], applying the optional z-rotation. The schema itself is a
  * tiny driver-side value carried alongside the block DataFrame, never
  * per-row (SURVEY.md §1.4).
  *
  * Cell id ordering is x-fastest (VTK convention):
  * `id = i + nx*(j + ny*k)`.
  *
  * Bearing: identity when |bearing − 90| ≤ 0.01; otherwise rotate about the
  * z axis at [[rotPoint]] by −(bearing − 90) degrees — `mesh_rotate_0261` /
  * `rotate_z_origin` (/root/reference/pd_vtk.py:500-520, 532-540).
  */
final case class GridSchema(
    ox: Double, oy: Double, oz: Double,
    sx: Double, sy: Double, sz: Double,
    nx: Int, ny: Int, nz: Int,
    bearing: Double = 90.0,
    rotX: Double = 0.0, rotY: Double = 0.0) {

  def nCells: Long = nx.toLong * ny * nz
  def rotated: Boolean = math.abs(bearing - 90.0) > 0.01
  private def angleRad: Double = math.toRadians(-(bearing - 90.0))

  def i(id: Long): Int = (id % nx).toInt
  def j(id: Long): Int = ((id / nx) % ny).toInt
  def k(id: Long): Int = (id / (nx.toLong * ny)).toInt
  def id(i: Int, j: Int, k: Int): Long = i + nx.toLong * (j + ny.toLong * k)

  /** Cell-center world coordinates. */
  def center(i: Int, j: Int, k: Int): (Double, Double, Double) = {
    val x = ox + (i + 0.5) * sx
    val y = oy + (j + 0.5) * sy
    val z = oz + (k + 0.5) * sz
    if (!rotated) (x, y, z)
    else {
      val c = math.cos(angleRad); val s = math.sin(angleRad)
      val dx = x - rotX; val dy = y - rotY
      (rotX + c * dx - s * dy, rotY + s * dx + c * dy, z)
    }
  }

  /** World → cell index (inverse of [[center]]); −1 outside the grid.
    * Pure arithmetic — the scale-safe replacement for VTK
    * `find_closest_cell` bucket assignment
    * (/root/reference/pd_vtk.py:671-702). */
  def cellAt(x: Double, y: Double, z: Double): Long = {
    var px = x; var py = y
    if (rotated) {
      val c = math.cos(-angleRad); val s = math.sin(-angleRad)
      val dx = x - rotX; val dy = y - rotY
      px = rotX + c * dx - s * dy
      py = rotY + s * dx + c * dy
    }
    val ci = math.floor((px - ox) / sx).toLong
    val cj = math.floor((py - oy) / sy).toLong
    val ck = math.floor((z - oz) / sz).toLong
    if (ci < 0 || ci >= nx || cj < 0 || cj >= ny || ck < 0 || ck >= nz) -1L
    else ci + nx.toLong * (cj + ny.toLong * ck)
  }

  def cellVolume: Double = sx * sy * sz

  /** `xxxyyyzzz`-style flat ijk key (`vtk_grid_flag_ijk`,
    * /root/reference/pd_vtk.py:1151-1176): a single integer encoding. */
  def ijkKey(i: Int, j: Int, k: Int): Long =
    i.toLong * 1000000L + j.toLong * 1000L + k.toLong
}

object GridSchema {

  /** Grid covering a bounding box: dims = ⌈(max−min)/size⌉ + 5 cells,
    * origin = min − 2·size — the reference's padding convention
    * (`from_bb`, /root/reference/pd_vtk.py:593-607). */
  def fromBb(bb: Array[Double], sx: Double, sy: Double, sz: Double): GridSchema = {
    val nx = math.ceil((bb(1) - bb(0)) / sx).toInt + 5
    val ny = math.ceil((bb(3) - bb(2)) / sy).toInt + 5
    val nz = math.ceil((bb(5) - bb(4)) / sz).toInt + 5
    GridSchema(bb(0) - 2 * sx, bb(2) - 2 * sy, bb(4) - 2 * sz,
      sx, sy, sz, nx, ny, nz)
  }

  /** Parse the numeric schema string `"sx,sy,sz;offset;bearing"` over a
    * bounding box (`from_bb_schema`, /root/reference/pd_vtk.py:609-642;
    * separators `[;~]` and `[,_]`). Offset shifts the bb in cell
    * multiples; bearing rotates about the bb minimum corner. */
  def fromBbSchema(bb: Array[Double], schema: String): GridSchema = {
    val parts = schema.split("[;~]")
    val size = parts(0).split("[,_]").map(_.toDouble)
    val Array(sx, sy, sz) =
      if (size.length >= 3) size.take(3) else Array.fill(3)(size(0))
    val offset =
      if (parts.length > 1 && parts(1).nonEmpty) parts(1).split("[,_]").map(_.toDouble)
      else Array(0.0)
    val bearing = if (parts.length > 2 && parts(2).nonEmpty) parts(2).toDouble else 0.0

    val bbr = bb.clone()
    if (offset.exists(_ != 0.0)) {
      val o = if (offset.length >= 3) offset else Array.fill(3)(offset(0))
      bbr(0) += sx * o(0); bbr(1) += sx * o(0)
      bbr(2) += sy * o(1); bbr(3) += sy * o(1)
      bbr(4) += sz * o(2); bbr(5) += sz * o(2)
    }
    val g = fromBb(bbr, sx, sy, sz)
    if (bearing != 0.0)
      g.copy(bearing = bearing, rotX = bb(0), rotY = bb(2))
    else g
  }

  /** Grid covering sparse points: dims = ⌈(max−min)/size⌉ + 2, origin =
    * min − size/2 (`from_df`, /root/reference/pd_vtk.py:650-669). */
  def fromPointsBb(bb: Array[Double], sx: Double, sy: Double, sz: Double): GridSchema = {
    val nx = math.ceil((bb(1) - bb(0)) / sx).toInt + 2
    val ny = math.ceil((bb(3) - bb(2)) / sy).toInt + 2
    val nz = math.ceil((bb(5) - bb(4)) / sz).toInt + 2
    GridSchema(bb(0) - sx / 2, bb(2) - sy / 2, bb(4) - sz / 2,
      sx, sy, sz, nx, ny, nz)
  }
}

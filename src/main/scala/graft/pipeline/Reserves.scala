package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{Breakdown, BreakdownSpec}
import graft.model.{GridSchema, TriMesh}
import graft.operators.{FlagRegions, GridOps, MineDepletion}
import graft.sources.VtkLegacy

/** Entry point A — the reserves report (`vtk_reserves`,
  * /root/reference/vtk_reserves.py:110-134). The whole computation is ONE
  * lazy DataFrame pipeline:
  *
  *   scan → volume → mine (depletion) → region (flag) → filter → groupBy.agg
  *
  * with Catalyst doing pruning/pushdown and the only shuffle at the final
  * low-cardinality aggregation (SURVEY.md §3).
  *
  * Spec rewrites before aggregation (vtk_reserves.py:92-107): `mine` is
  * appended as a weight to every mean/sum row, and `region` is prepended as
  * a group key when region solids are present.
  */
object Reserves {

  def run(spark: SparkSession, blockModel: DataFrame, schema: GridSchema,
      variables: String, regions: Seq[TriMesh], mineInclude: Seq[TriMesh],
      mineExclude: Seq[TriMesh], subBlocks: Int = 0): DataFrame = {
    var vl = BreakdownSpec.addWeight(BreakdownSpec.parse(variables), "mine")
    if (regions.nonEmpty) vl = BreakdownSpec.addRegion(vl)

    var df = blockModel
    if (!df.columns.contains("volume"))
      df = GridOps.cellsVolume(df, schema) // vtk_reserves.py:49-50
    df = MineDepletion(spark, df, mineInclude, mineExclude, schema.sz,
      subBlocks = subBlocks, cellSizeXY = (schema.sx, schema.sy))
    if (regions.nonEmpty) {
      df = FlagRegions(spark, df, regions)
      df = df.filter(col("region") =!= "") // vtk_reserves.py:86-88
    }
    Breakdown.run(df, vl)
  }

  /** File-path variant mirroring the reference CLI: block model from
    * legacy VTK; solids from any supported mesh format (vtk/obj/msh —
    * `pv_read` dispatch); region names = file basenames
    * (vtk_reserves.py:69-78). */
  def runFiles(spark: SparkSession, blockModelPath: String, variables: String,
      regionPaths: Seq[String], includePaths: Seq[String],
      excludePaths: Seq[String], subBlocks: Int = 0): DataFrame = {
    val grid = VtkLegacy.readGrid(blockModelPath)
    run(spark, grid.toDf(spark), grid.schema, variables,
      regionPaths.map(p => graft.sources.MeshIO.read(p)),
      includePaths.map(p => graft.sources.MeshIO.read(p)),
      excludePaths.map(p => graft.sources.MeshIO.read(p)),
      subBlocks)
  }
}

/** Entry point B — the generic pivot (`bm_breakdown`,
  * /root/reference/bm_breakdown.py:41-60): scan(+condition+pruning) →
  * breakdown → result. */
object BmBreakdown {
  def run(df: DataFrame, condition: String, variables: String): DataFrame =
    Breakdown(graft.sources.Ingest.filterCondition(df, condition), variables)
}

/** Entry point C — depletion only (`vtk_mine`,
  * /root/reference/vtk_mine.py:97-126): grid from file or synthesized from a
  * schema string over the union bounding box of the meshes; flags `mine`. */
object VtkMine {
  def run(spark: SparkSession, schema: GridSchema, includes: Seq[TriMesh],
      excludes: Seq[TriMesh], subBlocks: Int = 0): DataFrame =
    MineDepletion(spark, GridOps.generate(spark, schema), includes, excludes,
      schema.sz, subBlocks = subBlocks, cellSizeXY = (schema.sx, schema.sy))

  /** Union bounding box of meshes ± buffer (`vtk_meshes_bb`,
    * /root/reference/pd_vtk.py:1132-1149). */
  def meshesBb(meshes: Seq[TriMesh], buffer: Double = 0.0): Array[Double] = {
    val b = Array(Double.MaxValue, Double.MinValue, Double.MaxValue,
      Double.MinValue, Double.MaxValue, Double.MinValue)
    meshes.foreach { m =>
      val mb = m.bounds
      for (ax <- 0 until 3) {
        if (mb(2 * ax) < b(2 * ax)) b(2 * ax) = mb(2 * ax)
        if (mb(2 * ax + 1) > b(2 * ax + 1)) b(2 * ax + 1) = mb(2 * ax + 1)
      }
    }
    for (ax <- 0 until 3) { b(2 * ax) -= buffer; b(2 * ax + 1) += buffer }
    b
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.model.TriMesh

/** Sink dispatch by extension — the engine's `pd_save_dataframe`
  * (/root/reference/_gui.py:335-395). Tabular sinks are Spark-native
  * distributed writers (csv with header, json, parquet); mesh sinks
  * (vtk/obj/msh) collect the row-encoded geometry driver-side (meshes are
  * KB-scale) and emit through the codec writers. XLSX is replaced by CSV
  * (DEVIATIONS.md). */
object Egress {

  def save(df: DataFrame, path: String): Unit = {
    val lower = path.toLowerCase
    val ext = lower.substring(lower.lastIndexOf('.') + 1)
    ext match {
      case "csv" | "txt" | "prn" | "asc" =>
        df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      case "json" | "jsdb" =>
        df.write.mode(SaveMode.Overwrite).json(path)
      case "parquet" =>
        df.write.mode(SaveMode.Overwrite).parquet(path)
      case "xlsx" =>
        XlsxCodec.write(df, path)
      case "xls" =>
        XlsCodec.write(df, path)
      case "png" | "bmp" =>
        SpectralCodec.write(df, path)
      case "tif" | "tiff" =>
        GeoTiffCodec.write(df, path)
      case "vtk" =>
        VtkWriter.writePolyData(meshOf(df, path), path)
      case "obj" =>
        ObjCodec.write(meshOf(df, path), path)
      case "msh" =>
        MshCodec.write(meshOf(df, path), path)
      case "glb" =>
        GltfCodec.write(meshOf(df, path), path)
      case "shp" =>
        ShpCodec.write(df, path)
      case "dxf" =>
        DxfCodec.write(df, path)
      case other =>
        throw new IllegalArgumentException(s"unsupported sink extension: $other")
    }
  }

  private def meshOf(df: DataFrame, path: String): TriMesh =
    MeshRows.fromDf(df, VtkLegacy.meshName(path))

  /** One file per mesh, named `<dir>/<mesh name>.<ext>` — the reference's
    * `pv_save_split` (/root/reference/pd_vtk.py:89-92; its MultiBlock
    * container is viz-only, so many-mesh egress splits instead). */
  def saveMeshesSplit(meshes: Seq[TriMesh], dir: String, ext: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    meshes.foreach { m =>
      val path = s"$dir/${m.name}.$ext"
      ext match {
        case "vtk" => VtkWriter.writePolyData(m, path)
        case "obj" => ObjCodec.write(m, path)
        case "msh" => MshCodec.write(m, path)
        case other =>
          throw new IllegalArgumentException(s"unsupported mesh extension: $other")
      }
    }
  }
}

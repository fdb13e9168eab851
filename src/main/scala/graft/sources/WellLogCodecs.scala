package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** LAS 2.0 well-log reader (Log ASCII Standard) — the engine's
  * `pd_load_las` (/root/reference/_gui.py:1333-1340, via lasio): curve
  * mnemonics from the `~C` section become columns, `~A` data rows become
  * rows, and the `~W` section's NULL sentinel (default −999.25) masks to
  * SQL NULL like lasio's NaN substitution. Wrapped data lines accumulate
  * until a full curve set is read. */
object LasCodec {

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).split("\r?\n")
    var section = ' '
    var nullValue = -999.25
    val curves = mutable.ArrayBuffer.empty[String]
    val data = mutable.ArrayBuffer.empty[Array[java.lang.Double]]
    val pending = mutable.ArrayBuffer.empty[Double]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        if (line.startsWith("~")) section = line.charAt(1).toUpper
        else section match {
          case 'W' =>
            // "NULL.   -999.25  : null value"
            val mnem = line.takeWhile(c => c != '.' && !c.isWhitespace)
            if (mnem.equalsIgnoreCase("NULL")) {
              val body = line.dropWhile(_ != '.').drop(1)
                .dropWhile(!_.isWhitespace).takeWhile(_ != ':').trim
              if (body.nonEmpty) nullValue = body.split("\\s+")(0).toDouble
            }
          case 'C' =>
            // "DEPT.M   : depth" → mnemonic before the unit dot
            curves += line.takeWhile(c => c != '.' && !c.isWhitespace).trim
          case 'A' =>
            pending ++= line.split("\\s+").map(_.toDouble)
            while (pending.length >= curves.length && curves.nonEmpty) {
              data += pending.take(curves.length)
                .map(v => if (v == nullValue) null
                  else java.lang.Double.valueOf(v)).toArray
              pending.remove(0, curves.length)
            }
          case _ =>
        }
      }
    }
    require(curves.nonEmpty, s"no ~Curve section in $path")
    val schema = StructType(curves.map(c => StructField(c, DoubleType)).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        data.toSeq.map(a => Row.fromSeq(a.toSeq)), 1), schema)
  }
}

/** Spectral image → rows (`pd_load_spectral` + `img_to_df`,
  * /root/reference/_gui.py:1251-1264): one row per pixel with `x` = row
  * index, `y` = column index, and one column per channel named "0"…"n−1".
  * JDK ImageIO decodes PNG (and JPEG/BMP/GIF) without external deps. */
object SpectralCodec {

  def read(spark: SparkSession, path: String): DataFrame = {
    val img = javax.imageio.ImageIO.read(new java.io.File(path))
    require(img != null, s"not a decodable image: $path")
    val raster = img.getRaster
    val bands = raster.getNumBands
    val schema = StructType(
      Seq(StructField("x", LongType), StructField("y", LongType)) ++
      (0 until bands).map(b => StructField(b.toString, LongType)))
    val rows = for (r <- 0 until img.getHeight; c <- 0 until img.getWidth)
      yield Row.fromSeq(Seq(r.toLong, c.toLong) ++
        (0 until bands).map(b => raster.getSample(c, r, b).toLong))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Inverse of [[read]] (`pd_save_spectral`, /root/reference/_gui.py:
    * 1266-1279): pixel rows back to an image. Channel count comes from the
    * numeric columns besides x/y (1 → gray, 3 → RGB, 4 → ARGB). */
  def write(df: DataFrame, path: String): Unit = {
    val chans = df.columns.filterNot(c => c == "x" || c == "y")
    require(Set(1, 3, 4).contains(chans.length),
      s"spectral write needs 1 (gray), 3 (RGB) or 4 (ARGB) channel " +
        s"columns, got ${chans.length}: ${chans.mkString(",")}")
    val rows = df.collect()
    val h = rows.map(_.getAs[Number]("x").intValue()).max + 1
    val w = rows.map(_.getAs[Number]("y").intValue()).max + 1
    val imgType = chans.length match {
      case 1 => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      case 4 => java.awt.image.BufferedImage.TYPE_INT_ARGB
      case _ => java.awt.image.BufferedImage.TYPE_INT_RGB
    }
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    val raster = img.getRaster
    rows.foreach { r =>
      val x = r.getAs[Number]("x").intValue()
      val y = r.getAs[Number]("y").intValue()
      chans.zipWithIndex.foreach { case (c, b) =>
        raster.setSample(y, x, b, r.getAs[Number](c).intValue())
      }
    }
    val fmt = path.toLowerCase.substring(path.lastIndexOf('.') + 1)
    // ImageIO signals "no writer for this format/image combination" by
    // returning false, not by throwing — silent empty output otherwise
    require(javax.imageio.ImageIO.write(img, fmt, new java.io.File(path)),
      s"no ImageIO writer for format '$fmt' with ${chans.length} channels")
  }
}

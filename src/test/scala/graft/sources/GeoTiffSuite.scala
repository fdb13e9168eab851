package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest
import graft.model.{GridSchema, TriMesh}
import graft.operators.{GridOps, MineDepletion}

class GeoTiffSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  /** Reference-shaped pixel frame: an analytic float band over a 4×3
    * raster georeferenced at origin (500, 800), 2 m pixels (north-up),
    * CRS EPSG:32633 (UTM — a PROJECTED code, exercising geokey 3072). */
  private def pixelDf() = {
    import spark.implicits._
    val px = for (xc <- 0 until 4; yc <- 0 until 3) yield {
      val x = 500.0 + 2.0 * xc
      val y = 800.0 - 2.0 * yc
      (32633.0, xc.toDouble, yc.toDouble, 500.0, 2.0, 0.0, 800.0, 0.0, -2.0,
        x, y, (0.5 * x + 0.25 * y).toFloat.toDouble)
    }
    px.toDF("EPSG", "xc", "yc", "x0", "txx", "txy", "y0", "tyx", "tyy",
      "x", "y", "0")
  }

  test("GeoTIFF round-trip: float band, affine geotransform, EPSG") {
    val d = Files.createTempDirectory("graft_tif").toString
    GeoTiffCodec.write(pixelDf(), d + "/r.tif")
    val back = GeoTiffCodec.read(spark, d + "/r.tif")
    assert(back.columns.toSeq == Seq("EPSG", "x0", "txx", "txy", "y0",
      "tyx", "tyy", "xc", "yc", "x", "y", "0"))
    assert(back.count() == 12)
    // the CRS comes from the DATA, not a hardcoded constant
    assert(back.select("EPSG").distinct().collect()
      .map(_.getDouble(0)).toSeq == Seq(32633.0))
    val m = back.collect().map(r => (r.getDouble(7), r.getDouble(8)) ->
      (r.getDouble(9), r.getDouble(10), r.getDouble(11))).toMap
    for (xc <- 0 until 4; yc <- 0 until 3) {
      val (x, y, v) = m((xc.toDouble, yc.toDouble))
      assert(x == 500.0 + 2.0 * xc && y == 800.0 - 2.0 * yc)
      assert(math.abs(v - (0.5 * x + 0.25 * y)) < 1e-3) // float32 grain
    }
    // geotransform columns survive the round-trip
    val r0 = back.orderBy("xc", "yc").collect()(0)
    assert((1 to 6).map(r0.getDouble) == Seq(500.0, 2.0, 0.0, 800.0, 0.0, -2.0))
  }

  for (codec <- Seq("deflate", "lzw"))
    test(s"$codec-compressed write round-trips through the reader") {
      val d = Files.createTempDirectory("graft_tifz").toString
      GeoTiffCodec.write(pixelDf(), d + "/z.tif", compression = codec)
      GeoTiffCodec.write(pixelDf(), d + "/u.tif")
      // the compressed file is genuinely smaller on this compressible ramp
      val (zLen, uLen) = (new java.io.File(d + "/z.tif").length,
        new java.io.File(d + "/u.tif").length)
      assert(zLen < uLen, s"$codec $zLen !< uncompressed $uLen")
      // identical pixels, geotransform, and CRS through the existing reader
      def norm(p: String) = GeoTiffCodec.read(spark, p).collect()
        .map(r => (r.getDouble(7), r.getDouble(8)) ->
          (r.getDouble(0), r.getDouble(1), r.getDouble(11))).toMap
      assert(norm(d + "/z.tif") == norm(d + "/u.tif"))
    }

  test("LZW write survives dictionary resets and cross-decodes via ImageIO") {
    // ~29k float32 pixels of a low-repetition analytic pattern: > 4094
    // dictionary entries, forcing the encoder's mid-stream Clear + reset
    import spark.implicits._
    val n = 120
    val px = for (xc <- 0 until n; yc <- 0 until n) yield
      (xc.toDouble, yc.toDouble, 0.0, 1.0, 0.0, 0.0, 0.0, -1.0,
        xc.toDouble, -yc.toDouble,
        math.sin(xc * 12.9898 + yc * 78.233) * 43758.5453 % 1.0)
    val df = px.toDF("xc", "yc", "x0", "txx", "txy", "y0", "tyx", "tyy",
      "x", "y", "0")
    val d = Files.createTempDirectory("graft_tifl").toString
    GeoTiffCodec.write(df, d + "/big.tif", compression = "lzw")
    // our own reader round-trips every pixel exactly (float32 grain)
    val back = GeoTiffCodec.read(spark, d + "/big.tif").collect()
      .map(r => (r.getDouble(7), r.getDouble(8)) -> r.getDouble(11)).toMap
    assert(back.size == n * n)
    px.foreach { case t =>
      assert(math.abs(back((t._1, t._2)) - t._11.toFloat) < 1e-12,
        s"pixel (${t._1},${t._2})")
    }
    // an INDEPENDENT decoder (JDK ImageIO TIFF plugin) accepts the stream
    val img = javax.imageio.ImageIO.read(new java.io.File(d + "/big.tif"))
    assert(img != null && img.getWidth == n && img.getHeight == n)
    val r = img.getRaster
    px.take(500).foreach { t =>
      assert(math.abs(r.getSampleFloat(t._1.toInt, t._2.toInt, 0) -
        t._11.toFloat) < 1e-12)
    }
  }

  test("integer bands write as bytes and read back") {
    import spark.implicits._
    val df = (for (xc <- 0 until 3; yc <- 0 until 2) yield
      (xc.toDouble, yc.toDouble, 0.0, 1.0, 0.0, 0.0, 0.0, -1.0,
        xc.toDouble, -yc.toDouble, (xc * 10 + yc).toLong))
      .toDF("xc", "yc", "x0", "txx", "txy", "y0", "tyx", "tyy", "x", "y", "0")
    val d = Files.createTempDirectory("graft_tifb").toString
    GeoTiffCodec.write(df, d + "/b.tif")
    val back = GeoTiffCodec.read(spark, d + "/b.tif").collect()
      .map(r => (r.getDouble(7), r.getDouble(8)) -> r.getDouble(11)).toMap
    for (xc <- 0 until 3; yc <- 0 until 2)
      assert(back((xc.toDouble, yc.toDouble)) == xc * 10 + yc)
  }

  test("integer bands beyond byte range promote to float32, no wraparound") {
    import spark.implicits._
    val df = (for (xc <- 0 until 3; yc <- 0 until 2) yield
      (xc.toDouble, yc.toDouble, 0.0, 1.0, 0.0, 0.0, 0.0, -1.0,
        xc.toDouble, -yc.toDouble, (xc * 1000 + yc).toLong))
      .toDF("xc", "yc", "x0", "txx", "txy", "y0", "tyx", "tyy", "x", "y", "0")
    val d = Files.createTempDirectory("graft_tifw").toString
    GeoTiffCodec.write(df, d + "/w.tif")
    val back = GeoTiffCodec.read(spark, d + "/w.tif").collect()
      .map(r => (r.getDouble(7), r.getDouble(8)) -> r.getDouble(11)).toMap
    // 2000 must come back as 2000.0, not 2000 & 0xff = 208
    for (xc <- 0 until 3; yc <- 0 until 2)
      assert(back((xc.toDouble, yc.toDouble)) == xc * 1000 + yc)
  }

  /** Cross-decoder check: the JDK ImageIO TIFF writer (an independent
    * encoder) produces LZW / Deflate / PackBits files our strip decoder
    * must read back exactly. */
  for (codec <- Seq("LZW", "Deflate", "PackBits"))
    test(s"decodes $codec strips from the JDK ImageIO encoder") {
      val w = 37; val h = 11 // non-power-of-two sizes exercise code widths
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (x <- 0 until w; y <- 0 until h)
        img.getRaster.setSample(x, y, 0, (x * 7 + y * 31) % 251)
      val d = Files.createTempDirectory("graft_lzw").toString
      val f = new java.io.File(d + s"/$codec.tif")
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(codec)
      val out = javax.imageio.ImageIO.createImageOutputStream(f)
      wr.setOutput(out)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      out.close(); wr.dispose()
      val back = GeoTiffCodec.read(spark, f.getPath).collect()
        .map(r => (r.getDouble(7).toInt, r.getDouble(8).toInt) -> r.getDouble(11))
        .toMap
      assert(back.size == w * h)
      for (x <- 0 until w; y <- 0 until h)
        assert(back((x, y)) == (x * 7 + y * 31) % 251,
          s"pixel ($x,$y) under $codec")
    }

  test("GDAL_NODATA masks float pixels to NULL") {
    val d = Files.createTempDirectory("graft_nd").toString
    GeoTiffCodec.write(pixelDf(), d + "/r.tif")
    // append-style check is overkill; instead verify NaN→null masking on
    // a handwritten nodata raster via the writer's float path + patching
    // the band value to the sentinel then re-reading with a nodata tag is
    // not expressible through the public writer — assert the read-side
    // contract directly on NaN instead (writer emits NaN for nulls).
    import spark.implicits._
    val withNull = pixelDf().withColumn("0",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("xc") === 0.0, null)
        .otherwise(org.apache.spark.sql.functions.col("0")))
    GeoTiffCodec.write(withNull, d + "/n.tif")
    val back = GeoTiffCodec.read(spark, d + "/n.tif")
    assert(back.filter("`0` IS NULL").count() == 3) // xc=0 column of 3 rows
    assert(back.filter("`0` IS NOT NULL").count() == 9)
  }

  test("Ingest/Egress dispatch routes .tif") {
    val d = Files.createTempDirectory("graft_disp").toString
    Egress.save(pixelDf(), d + "/r.tif")
    val back = Ingest.load(spark, d + "/r.tif", keepNull = true)
    assert(back.count() == 12 && back.columns.contains("EPSG"))
  }

  test("elevation raster → mine depletion integration") {
    // a flat 152.3 m topo raster over the oracle grid footprint, exported
    // as GeoTIFF, re-ingested, and triangulated from its corner pixels —
    // depletion must match the analytic Topo quad used by q13
    import spark.implicits._
    val z = 152.3f.toDouble
    val px = for (xc <- 0 until 10; yc <- 0 until 10) yield {
      val x = 900.0 + 50.0 * xc
      val y = 2350.0 - 50.0 * yc
      (xc.toDouble, yc.toDouble, 900.0, 50.0, 0.0, 2350.0, 0.0, -50.0, x, y, z)
    }
    val d = Files.createTempDirectory("graft_topo").toString
    GeoTiffCodec.write(
      px.toDF("xc", "yc", "x0", "txx", "txy", "y0", "tyx", "tyy", "x", "y", "0"),
      d + "/topo.tif")
    val topoPx = GeoTiffCodec.read(spark, d + "/topo.tif")
      .select("x", "y", "0").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val xs = topoPx.map(_._1); val ys = topoPx.map(_._2)
    val zRaster = topoPx.head._3
    val rasterQuad = TriMesh.quad("topo", Array(
      xs.min, ys.min, zRaster, xs.max, ys.min, zRaster,
      xs.max, ys.max, zRaster, xs.min, ys.max, zRaster))
    val g = GridSchema(1000, 2000, 100, 10, 10, 10, 30, 20, 20)
    val analytic = TriMesh.quad("topo", Array(
      900, 1900, 152.3, 1350, 1900, 152.3, 1350, 2350, 152.3, 900, 2350, 152.3))
    val grid = GridOps.generate(spark, g)
    val a = MineDepletion(spark, grid, Seq(analytic), Seq.empty, g.sz)
      .select("id", "mine").as[(Long, Double)].collect().toMap
    val b = MineDepletion(spark, grid, Seq(rasterQuad), Seq.empty, g.sz)
      .select("id", "mine").as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    // raster footprint (900..1350 × 1900..2350 reversed rows) covers the
    // grid exactly like the analytic quad → identical depletion fractions
    // tolerance = the float32 storage grain of the raster band (z carries
    // ~3e-8 relative error, which maps to ~3e-7 of depletion fraction)
    a.foreach { case (id, v) => assert(math.abs(v - b(id)) < 1e-6, s"cell $id") }
  }
}

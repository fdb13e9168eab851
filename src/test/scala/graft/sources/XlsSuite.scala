package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

/** BIFF8 reader test against a spec-built fixture (the sandbox has no
  * Excel or xlwt, so the .xls bytes are assembled record-by-record from
  * the public [MS-XLS]/[MS-CFB] layouts: OLE2 header + FAT + directory +
  * miniFAT + mini stream holding the Workbook, which exercises the
  * mini-stream path real small files take). */
class XlsSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def le(bb: ByteBuffer) = bb.order(ByteOrder.LITTLE_ENDIAN)

  private def record(op: Int, body: Array[Byte]): Array[Byte] = {
    val b = le(ByteBuffer.allocate(4 + body.length))
    b.putShort(op.toShort).putShort(body.length.toShort).put(body)
    b.array()
  }

  private def cellHead(rw: Int, col: Int): ByteBuffer = {
    val b = le(ByteBuffer.allocate(64))
    b.putShort(rw.toShort).putShort(col.toShort).putShort(0) // ixfe
    b
  }
  private def takeBytes(b: ByteBuffer): Array[Byte] =
    java.util.Arrays.copyOf(b.array(), b.position())

  /** Compressed (8-bit) SST string with no rich/ext data. */
  private def sstString(s: String): Array[Byte] = {
    val b = le(ByteBuffer.allocate(3 + s.length))
    b.putShort(s.length.toShort).put(0.toByte)
      .put(s.getBytes("ISO-8859-1"))
    b.array()
  }

  private def buildWorkbookStream(): Array[Byte] = {
    val strings = Seq("lito", "grade", "note", "ore", "waste", "x07")
    val sstBody = {
      val parts = strings.map(sstString)
      val b = le(ByteBuffer.allocate(8 + parts.map(_.length).sum))
      b.putInt(strings.length).putInt(strings.length)
      parts.foreach(b.put)
      b.array()
    }
    val bofGlobals = record(0x0809, {
      val b = le(ByteBuffer.allocate(16))
      b.putShort(0x0600.toShort).putShort(0x0005.toShort)
      b.putShort(0).putShort(0).putInt(0).putInt(0)
      b.array()
    })
    val bofSheet = record(0x0809, {
      val b = le(ByteBuffer.allocate(16))
      b.putShort(0x0600.toShort).putShort(0x0010.toShort)
      b.putShort(0).putShort(0).putInt(0).putInt(0)
      b.array()
    })
    val eof = record(0x000A, Array.emptyByteArray)

    // sheet cells. header row 0: lito(SST 0), grade(SST 1), note(SST 2)
    def labelSst(rw: Int, col: Int, isst: Int) = record(0x00FD, {
      val b = cellHead(rw, col); b.putInt(isst); takeBytes(b)
    })
    def number(rw: Int, col: Int, v: Double) = record(0x0203, {
      val b = cellHead(rw, col); b.putDouble(v); takeBytes(b)
    })
    def rkInt(rw: Int, col: Int, v: Int, div100: Boolean = false) =
      record(0x027E, {
        val b = cellHead(rw, col)
        b.putInt((v << 2) | (if (div100) 1 else 0) | 2); takeBytes(b)
      })
    def label(rw: Int, col: Int, s: String) = record(0x0204, {
      val b = cellHead(rw, col)
      b.putShort(s.length.toShort).put(0.toByte).put(s.getBytes("ISO-8859-1"))
      takeBytes(b)
    })
    def mulrk(rw: Int, colFirst: Int, vals: Seq[Double]) = record(0x00BD, {
      val b = le(ByteBuffer.allocate(6 + vals.length * 6))
      b.putShort(rw.toShort).putShort(colFirst.toShort)
      vals.foreach { v =>
        b.putShort(0) // ixfe
        // RK float form: top 30 bits of the IEEE double
        val bits = java.lang.Double.doubleToLongBits(v)
        b.putInt(((bits >>> 32) & 0xFFFFFFFCL).toInt)
      }
      b.putShort((colFirst + vals.length - 1).toShort)
      b.array()
    })

    val sheet = Array(
      bofSheet,
      labelSst(0, 0, 0), labelSst(0, 1, 1), labelSst(0, 2, 2), // header
      labelSst(1, 0, 3), number(1, 1, 2.75), label(1, 2, "first"),
      labelSst(2, 0, 4), rkInt(2, 1, 12), labelSst(2, 2, 5),
      labelSst(3, 0, 3), mulrk(3, 1, Seq(1.5)), label(3, 2, "tail"),
      // RK ÷100: 425 → 4.25 in a numeric column of row 4
      labelSst(4, 0, 4), rkInt(4, 1, 425, div100 = true),
      eof).flatten

    // globals: BOF, BOUNDSHEET (needs the sheet BOF offset), SST, EOF
    def globals(sheetOff: Int) = {
      val name = "Data"
      val bs = record(0x0085, {
        val b = le(ByteBuffer.allocate(8 + name.length))
        b.putInt(sheetOff).putShort(0)
        b.put(name.length.toByte).put(0.toByte) // compressed 8-bit name
        b.put(name.getBytes("ISO-8859-1"))
        b.array()
      })
      Array(bofGlobals, bs, record(0x00FC, sstBody), eof).flatten
    }
    val size0 = globals(0).length // BOUNDSHEET length is offset-independent
    globals(size0) ++ sheet
  }

  /** Minimal OLE2 container: FAT sector, directory, miniFAT, mini stream. */
  private def buildXls(workbook: Array[Byte]): Array[Byte] = {
    require(workbook.length < 4096, "fixture expects the mini-stream path")
    val nMini = (workbook.length + 63) / 64
    val miniBytes = nMini * 64
    val nMiniSectors = (miniBytes + 511) / 512
    val total = 512 * (1 + 3 + nMiniSectors)
    val out = le(ByteBuffer.allocate(total))
    // header
    out.putLong(0xE11AB1A1E011CFD0L) // magic, little-endian constant
    out.put(new Array[Byte](16)) // clsid
    out.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor/major
    out.putShort(0xFFFE.toShort) // byte order
    out.putShort(9.toShort).putShort(6.toShort) // sector 512, mini 64
    out.put(new Array[Byte](6))
    out.putInt(0) // nDir (v3: unused)
    out.putInt(1) // nFat
    out.putInt(1) // first dir sector
    out.putInt(0) // transaction
    out.putInt(4096) // mini cutoff
    out.putInt(2) // first miniFAT sector
    out.putInt(1) // nMiniFat
    out.putInt(0xFFFFFFFE) // first DIFAT
    out.putInt(0) // nDifat
    out.putInt(0) // DIFAT[0] = FAT at sector 0
    (1 until 109).foreach(_ => out.putInt(0xFFFFFFFF))
    require(out.position() == 512)
    // sector 0: FAT
    out.putInt(0xFFFFFFFD) // sector 0 = FAT itself
    out.putInt(0xFFFFFFFE) // sector 1 = directory (end)
    out.putInt(0xFFFFFFFE) // sector 2 = miniFAT (end)
    (0 until nMiniSectors).foreach { i =>
      out.putInt(if (i == nMiniSectors - 1) 0xFFFFFFFE else 3 + i + 1)
    }
    (3 + nMiniSectors until 128).foreach(_ => out.putInt(0xFFFFFFFF))
    // sector 1: directory
    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val b = le(ByteBuffer.allocate(128))
      val utf = name.getBytes("UTF-16LE")
      b.put(utf)
      b.position(64)
      b.putShort((utf.length + 2).toShort)
      b.put(typ.toByte)
      b.put(1.toByte) // color
      b.putInt(0xFFFFFFFF).putInt(0xFFFFFFFF).putInt(0xFFFFFFFF) // siblings/child
      b.position(116)
      b.putInt(start)
      b.putInt(size)
      b.array()
    }
    out.put(dirEntry("Root Entry", 5, 3, miniBytes))
    out.put(dirEntry("Workbook", 2, 0, workbook.length))
    out.put(new Array[Byte](256)) // two unused entries
    // sector 2: miniFAT — workbook occupies minisectors 0..nMini-1
    (0 until nMini).foreach { i =>
      out.putInt(if (i == nMini - 1) 0xFFFFFFFE else i + 1)
    }
    (nMini until 128).foreach(_ => out.putInt(0xFFFFFFFF))
    // sectors 3+: mini stream
    out.put(workbook)
    out.put(new Array[Byte](total - out.position()))
    out.array()
  }

  test("BIFF8 .xls: OLE2 mini-stream, SST, NUMBER/RK/MULRK/LABEL cells") {
    val d = Files.createTempDirectory("graft_xls").toString
    val p = d + "/legacy.xls"
    Files.write(java.nio.file.Paths.get(p), buildXls(buildWorkbookStream()))
    val df = XlsCodec.read(spark, p)
    assert(df.columns.toSeq == Seq("lito", "grade", "note"))
    val rows = df.orderBy("grade").collect()
    assert(df.schema("grade").dataType.typeName == "double")
    val byGrade = rows.map(r => r.getDouble(1) ->
      (r.getString(0), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(byGrade(2.75) == (("ore", "first")))
    assert(byGrade(12.0) == (("waste", "x07"))) // RK int + SST lookup
    assert(byGrade(1.5) == (("ore", "tail")))   // MULRK float + inline LABEL
    assert(byGrade(4.25) == (("waste", null)))  // RK ÷100, missing cell → null
    // sheet selection + dispatch
    assert(XlsCodec.read(spark, p + "!Data").count() == 4)
    assert(Ingest.load(spark, p, keepNull = true).count() == 4)
    val err = intercept[IllegalArgumentException](XlsCodec.read(spark, p + "!nope"))
    assert(err.getMessage.contains("Data"))
  }

  test("XLS write-back: write → read round-trip, named sheet, Egress dispatch") {
    import spark.implicits._
    val df = Seq(
      ("ore", 2.75, "first", Some(7L)),
      ("waste", 12.0, "x07 ünïcödé", None),
      ("ore", 4.25, null, Some(-3L)))
      .toDF("lito", "grade", "note", "cnt")
    val d = Files.createTempDirectory("graft_xlsw").toString
    XlsCodec.write(df, d + "/report.xls!Results")
    val back = XlsCodec.read(spark, d + "/report.xls!Results")
    assert(back.columns.toSeq == Seq("lito", "grade", "note", "cnt"))
    // numeric columns come back double; strings (incl. non-latin) intact
    assert(back.schema("grade").dataType.typeName == "double")
    assert(back.schema("cnt").dataType.typeName == "double")
    val rows = back.orderBy("grade").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
    assert(rows.toSeq == Seq(
      ("ore", 2.75, "first", 7.0),
      ("ore", 4.25, null, -3.0),
      ("waste", 12.0, "x07 ünïcödé", null)))
    // default sheet name + extension dispatch both ways
    Egress.save(df, d + "/plain.xls")
    assert(XlsCodec.read(spark, d + "/plain.xls!Sheet1").count() == 3)
    assert(Ingest.load(spark, d + "/plain.xls", keepNull = true).count() == 3)
    // a wide-ish frame crosses the one-sector boundary in the CFB writer
    val wide = (0L until 400L).map(i => (i, s"row$i", i * 0.5))
      .toDF("id", "name", "v")
    XlsCodec.write(wide, d + "/wide.xls")
    val wb = XlsCodec.read(spark, d + "/wide.xls")
    assert(wb.count() == 400)
    assert(wb.agg(org.apache.spark.sql.functions.sum("v")).first().getDouble(0)
      == (0L until 400L).map(_ * 0.5).sum)
  }

  test("XLS write: >255-char cells round-trip via SST + LABELSST (with CONTINUE)") {
    import spark.implicits._
    // distinct 4000-char bodies force the SST across a CONTINUE boundary;
    // the duplicate exercises dedup (cstTotal > cstUnique); ünïcödé takes
    // the UTF-16 branch; 5000 chars truncates at the 4000 record bound
    def body(seed: Char) = seed.toString * 4000
    val dup = "shared long string ü " * 20 // 420 chars, used twice
    val df = Seq(
      (1L, "short inline"),
      (2L, "x" * 300),
      (3L, body('a')), (4L, body('b')), (5L, body('c')),
      (6L, dup), (7L, dup),
      (8L, "y" * 5000))
      .toDF("id", "note")
    val d = Files.createTempDirectory("graft_xlsl").toString
    XlsCodec.write(df, d + "/long.xls!L")
    val back = XlsCodec.read(spark, d + "/long.xls!L").orderBy("id")
      .collect().map(r => r.getDouble(0).toLong -> r.getString(1)).toMap
    assert(back(1L) == "short inline")
    assert(back(2L) == "x" * 300)
    assert(back(3L) == body('a') && back(4L) == body('b') && back(5L) == body('c'))
    assert(back(6L) == dup && back(7L) == dup)
    assert(back(8L) == "y" * 4000) // documented one-record bound
  }

  test("XLS multi-sheet write: each sheet reads back by name") {
    import spark.implicits._
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v")
    val b = Seq((10L, "p"), (20L, "q"), (30L, "r")).toDF("id", "tag")
    val d = Files.createTempDirectory("graft_xlsm").toString
    XlsCodec.writeSheets(Seq("alpha" -> a, "beta" -> b), d + "/multi.xls")
    val backA = XlsCodec.read(spark, d + "/multi.xls!alpha")
    val backB = XlsCodec.read(spark, d + "/multi.xls!beta")
    assert(backA.columns.toSeq == Seq("k", "v") && backA.count() == 2)
    assert(backB.columns.toSeq == Seq("id", "tag") && backB.count() == 3)
    assert(backB.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("p", "q", "r"))
    // default read (no !sheet) takes the first sheet
    assert(XlsCodec.read(spark, d + "/multi.xls").columns.toSeq == Seq("k", "v"))
    intercept[IllegalArgumentException](
      XlsCodec.writeSheets(Seq("s" -> a, "s" -> b), d + "/dup.xls"))
  }
}

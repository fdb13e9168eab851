package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Legacy binary Excel (.xls, BIFF8 inside an OLE2 compound file) codec —
  * closes the reference's `pd.read_excel` pre-2007 branch
  * (/root/reference/_gui.py:227-228, which delegates to xlrd) and the
  * matching ExcelWriter save-back (_gui.py:350-352). The modern format's
  * codec is [[XlsxCodec]].
  *
  * Container: OLE2/CFB — header DIFAT → FAT chains → directory; the
  * `Workbook` (or `Book`) stream, from the mini-stream when it is under
  * the 4096-byte cutoff. BIFF8 records decoded: BOUNDSHEET (sheet
  * directory), SST + CONTINUE (shared strings, including the
  * option-flag restart at continuation boundaries), LABELSST, LABEL,
  * NUMBER, RK, MULRK, BOOLERR, BLANK/MULBLANK, FORMULA cached numeric
  * results. Same DataFrame semantics as [[XlsxCodec.read]]: first row is
  * the header, a column is double only when every present cell is
  * numeric, `path!sheet` selects a sheet by name. */
object XlsCodec {

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  // ------------------------------------------------------------ OLE2 / CFB
  private class Cfb(bytes: Array[Byte]) {
    private def u16(off: Int) = ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8))
    private def i32(off: Int) =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)

    require(bytes.length >= 512 &&
      (bytes(0) & 0xff) == 0xD0 && (bytes(1) & 0xff) == 0xCF &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xE0,
      "not an OLE2 compound file (bad magic)")
    private val sectorSize = 1 << u16(30)
    private val miniSize = 1 << u16(32)
    private val nFat = i32(44)
    private val firstDir = i32(48)
    private val miniCutoff = i32(56)
    private val firstMiniFat = i32(60)
    private val nMiniFat = i32(64)
    private val firstDifat = i32(68)
    private val nDifat = i32(72)

    private def sectorOff(s: Int) = 512 + s * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    private val fatSectors: Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      (0 until 109).foreach { i =>
        val v = i32(76 + 4 * i)
        if (v != FreeSect && out.length < nFat) out += v
      }
      var difat = firstDifat
      var n = 0
      while (difat != EndOfChain && difat != FreeSect && n < nDifat) {
        val off = sectorOff(difat)
        val per = sectorSize / 4 - 1
        (0 until per).foreach { i =>
          val v = i32(off + 4 * i)
          if (v != FreeSect && out.length < nFat) out += v
        }
        difat = i32(off + 4 * per)
        n += 1
      }
      out.toSeq
    }

    private def fatEntry(sector: Int): Int = {
      val per = sectorSize / 4
      i32(sectorOff(fatSectors(sector / per)) + 4 * (sector % per))
    }

    /** Full byte chain of a regular stream starting at `start`. */
    def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      while (s >= 0 && s != EndOfChain && out.size < size) {
        val off = sectorOff(s)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        s = fatEntry(s)
      }
      java.util.Arrays.copyOf(out.toByteArray, size.toInt)
    }

    // directory entries: (name, type, startSector, size)
    case class DirEntry(name: String, typ: Int, start: Int, size: Long)
    val dir: Seq[DirEntry] = {
      val raw = chain(firstDir, Long.MaxValue min (bytes.length.toLong))
      (0 until raw.length / 128).flatMap { i =>
        val off = i * 128
        val nameLen = (raw(off + 64) & 0xff) | ((raw(off + 65) & 0xff) << 8)
        if (nameLen < 2 || nameLen > 64) None
        else {
          val name = new String(raw, off, nameLen - 2, "UTF-16LE")
          val typ = raw(off + 66) & 0xff
          val b = ByteBuffer.wrap(raw, off + 116, 8).order(ByteOrder.LITTLE_ENDIAN)
          Some(DirEntry(name, typ, b.getInt, b.getInt & 0xffffffffL))
        }
      }
    }

    private lazy val miniFat: Array[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = firstMiniFat
      var n = 0
      while (s != EndOfChain && s != FreeSect && n < nMiniFat) {
        val off = sectorOff(s)
        (0 until sectorSize / 4).foreach(i => out += i32(off + 4 * i))
        s = fatEntry(s)
        n += 1
      }
      out.toArray
    }
    private lazy val miniStream: Array[Byte] = {
      val root = dir.find(_.typ == 5).getOrElse(
        throw new IllegalArgumentException("CFB has no root entry"))
      chain(root.start, root.size)
    }

    /** Stream payload by name, from the regular or mini stream. */
    def stream(name: String): Option[Array[Byte]] =
      dir.find(e => e.typ == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) chain(e.start, e.size)
        else {
          val out = new java.io.ByteArrayOutputStream()
          var s = e.start
          while (s >= 0 && s != EndOfChain && out.size < e.size) {
            out.write(miniStream, s * miniSize,
              math.min(miniSize, miniStream.length - s * miniSize))
            s = miniFat(s)
          }
          java.util.Arrays.copyOf(out.toByteArray, e.size.toInt)
        }
      }
  }

  // ------------------------------------------------------------------ BIFF
  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** XLUnicodeRichExtendedString at `pos` inside the SST record stream,
    * honoring CONTINUE boundaries (where fHighByte restates). `recs` is
    * the concatenated SST+CONTINUE payload; `bounds` are the payload
    * offsets where CONTINUE records begin. Returns (string, next pos). */
  private def readSstString(recs: Array[Byte], bounds: Seq[Int], pos0: Int): (String, Int) = {
    var pos = pos0
    def u8() = { val v = recs(pos) & 0xff; pos += 1; v }
    def u16() = { val v = (recs(pos) & 0xff) | ((recs(pos + 1) & 0xff) << 8); pos += 2; v }
    val cch = u16()
    var grbit = u8()
    val rich = (grbit & 8) != 0
    val ext = (grbit & 4) != 0
    val cRun = if (rich) u16() else 0
    val cbExt = if (ext) { val b = ByteBuffer.wrap(recs, pos, 4)
      .order(ByteOrder.LITTLE_ENDIAN); pos += 4; b.getInt } else 0
    val sb = new StringBuilder
    var remaining = cch
    while (remaining > 0) {
      // at a CONTINUE boundary the option byte restates
      if (bounds.contains(pos)) grbit = u8()
      val high = (grbit & 1) != 0
      val boundary = bounds.find(_ > pos).getOrElse(recs.length)
      val avail = if (high) (boundary - pos) / 2 else boundary - pos
      val take = math.min(remaining, avail)
      // a truncated/corrupt SST would otherwise loop forever on take == 0
      require(take > 0,
        s"corrupt SST: $remaining chars claimed but none available at offset $pos")
      if (high) {
        (0 until take).foreach { _ =>
          sb.append((((recs(pos) & 0xff) | ((recs(pos + 1) & 0xff) << 8))).toChar)
          pos += 2
        }
      } else {
        (0 until take).foreach { _ => sb.append((recs(pos) & 0xff).toChar); pos += 1 }
      }
      remaining -= take
    }
    pos += cRun * 4 + cbExt // skip formatting runs / ext data
    (sb.toString, pos)
  }

  // ------------------------------------------------------------------ read
  def read(spark: SparkSession, pathAndSheet: String): DataFrame = {
    val (path, sheetName) = pathAndSheet.split('!') match {
      case Array(p, s) => (p, Some(s))
      case _ => (pathAndSheet, None)
    }
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    val wb = cfb.stream("Workbook").orElse(cfb.stream("Book")).getOrElse(
      throw new IllegalArgumentException(s"no Workbook stream in $path"))

    // pass 1 over the globals substream: BOUNDSHEET + SST
    val sheets = mutable.ArrayBuffer.empty[(String, Int)] // (name, BOF offset)
    val sst = mutable.ArrayBuffer.empty[String]
    var pos = 0
    def u16at(p: Int) = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
    var depth = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val op = u16at(pos)
      val len = u16at(pos + 2)
      val body = pos + 4
      op match {
        case 0x0809 => // BOF: only BIFF8 (0x0600) uses these record layouts
          if (depth == 0) {
            val vers = u16at(body)
            require(vers == 0x0600,
              f"BIFF version 0x$vers%04X unsupported (BIFF8/Excel 97+ only): $path")
          }
          depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true // EOF
        case 0x0085 => // BOUNDSHEET: lbPlyPos(4) grbit(2) cch(1) grbitChr(1) name
          val bof = ByteBuffer.wrap(wb, body, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          val cch = wb(body + 6) & 0xff
          val high = (wb(body + 7) & 1) != 0
          val name =
            if (high) new String(wb, body + 8, cch * 2, "UTF-16LE")
            else new String(wb, body + 8, cch, "ISO-8859-1")
          sheets += ((name, bof))
        case 0x00FC => // SST (+ CONTINUE records)
          var recEnd = body + len
          val payload = new java.io.ByteArrayOutputStream()
          val bounds = mutable.ArrayBuffer.empty[Int]
          payload.write(wb, body, len)
          var p2 = recEnd
          while (p2 + 4 <= wb.length && u16at(p2) == 0x003C) { // CONTINUE
            val clen = u16at(p2 + 2)
            bounds += payload.size
            payload.write(wb, p2 + 4, clen)
            p2 = p2 + 4 + clen
          }
          val recs = payload.toByteArray
          val unique = ByteBuffer.wrap(recs, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          var sp = 8
          (0 until unique).foreach { _ =>
            val (s2, np) = readSstString(recs, bounds.toSeq, sp)
            sst += s2
            sp = np
          }
        case _ =>
      }
      pos = body + len
    }
    require(sheets.nonEmpty, s"no BOUNDSHEET records in $path")
    val (_, sheetBof) = sheetName match {
      case Some(n) => sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$n' not in ${sheets.map(_._1).mkString(",")}"))
      case None => sheets.head
    }

    // pass 2: the chosen sheet's cell records
    val cells = mutable.Map.empty[(Int, Int), (Any, Boolean)] // (row,col) → (value, isNum)
    pos = sheetBof
    depth = 0
    done = false
    while (!done && pos + 4 <= wb.length) {
      val op = u16at(pos)
      val len = u16at(pos + 2)
      val b = ByteBuffer.wrap(wb, pos + 4, len).order(ByteOrder.LITTLE_ENDIAN)
      op match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x0203 => // NUMBER
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          cells((rw, c)) = (b.getDouble, true)
        case 0x027E => // RK
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          cells((rw, c)) = (rkValue(b.getInt), true)
        case 0x00BD => // MULRK: rw, colFirst, (ixfe+rk)*, colLast
          val rw = b.getShort & 0xffff; val c0 = b.getShort & 0xffff
          val n = (len - 6) / 6
          (0 until n).foreach { i =>
            b.getShort; cells((rw, c0 + i)) = (rkValue(b.getInt), true)
          }
        case 0x00FD => // LABELSST
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          cells((rw, c)) = (sst(b.getInt), false)
        case 0x0204 => // LABEL (inline, BIFF8 unicode)
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          val cch = b.getShort & 0xffff
          val high = (b.get() & 1) != 0
          val s2 =
            if (high) { val a = new Array[Byte](cch * 2); b.get(a); new String(a, "UTF-16LE") }
            else { val a = new Array[Byte](cch); b.get(a); new String(a, "ISO-8859-1") }
          cells((rw, c)) = (s2, false)
        case 0x0205 => // BOOLERR: value as TRUE/FALSE text (xlrd-like)
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          val v = b.get(); val isErr = b.get()
          if (isErr == 0) cells((rw, c)) = (if (v != 0) "TRUE" else "FALSE", false)
        case 0x0006 => // FORMULA: cached result when numeric
          val rw = b.getShort & 0xffff; val c = b.getShort & 0xffff; b.getShort
          val raw = new Array[Byte](8); b.get(raw)
          val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          // non-numeric cached results flag 0xFFFF in the top two bytes
          if (((raw(6) & 0xff) | ((raw(7) & 0xff) << 8)) != 0xFFFF)
            cells((rw, c)) = (bb.getDouble, true)
        case _ =>
      }
      pos = pos + 4 + len
    }
    require(cells.nonEmpty, s"empty sheet in $path")

    val nCols = cells.keys.map(_._2).max + 1
    val nRows = cells.keys.map(_._1).max + 1
    val header = (0 until nCols).map(c =>
      cells.get((0, c)).map(_._1.toString).getOrElse(s"_c$c"))
    val isNum = (0 until nCols).map { c =>
      val vals = (1 until nRows).flatMap(r => cells.get((r, c)))
      vals.nonEmpty && vals.forall(_._2)
    }
    val schema = StructType((0 until nCols).map(c =>
      StructField(header(c), if (isNum(c)) DoubleType else StringType)))
    val rows = (1 until nRows).map { r =>
      Row.fromSeq((0 until nCols).map { c =>
        cells.get((r, c)) match {
          case None => null
          case Some((v, _)) =>
            if (isNum(c)) v.asInstanceOf[Double] else v.toString
        }
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  // ----------------------------------------------------------------- write
  /** BIFF8 .xls writer — the save-back half of the reference's ExcelWriter
    * path (_gui.py:350-352, pandas+xlwt). `path!sheet` names the sheet
    * (default "Sheet1"); [[writeSheets]] writes a multi-sheet workbook
    * ([[XlsxCodec.writeSheets]] parity). Header row from column names;
    * numeric columns emit NUMBER records, everything else inline-unicode
    * LABEL records (self-contained — no SST/CONTINUE machinery needed);
    * nulls stay blank. Driver-side assembly like [[XlsxCodec.write]] — XLS
    * egress is report-scale: the format caps sheets at 65 536 rows × 256
    * columns, and this writer's header-inline DIFAT caps the workbook
    * stream at ~7 MB (≈ 400k numeric cells); both bounds fail loudly.
    * Bigger frames belong in parquet/csv/xlsx. */
  def write(df: DataFrame, pathAndSheet: String): Unit = {
    val (path, sheetName) = pathAndSheet.split('!') match {
      case Array(p, s) => (p, s)
      case _ => (pathAndSheet, "Sheet1")
    }
    writeSheets(Seq(sheetName -> df), path)
  }

  /** Multi-sheet BIFF8 workbook: one BOUNDSHEET per entry in the globals
    * substream, then the worksheet substreams in order. */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeSheets needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(",")}")
    sheets.foreach { case (name, _) =>
      // Excel's hard cap — and the BOUNDSHEET cch is a single byte, so an
      // unchecked long name would silently corrupt the record
      require(name.nonEmpty && name.length <= 31,
        s"XLS sheet names hold 1..31 chars, got ${name.length}: '$name'")
    }
    val collected = sheets.map { case (name, df) =>
      val header = df.columns
      val data = df.collect()
      require(header.length <= 256,
        s"XLS holds at most 256 columns, got ${header.length} in '$name'")
      require(data.length + 1 <= 65536,
        s"XLS holds at most 65536 rows, got ${data.length + 1} in '$name'")
      val numeric = df.schema.fields.map(_.dataType match {
        case _: NumericType => true
        case _ => false
      })
      (name, header, data, numeric)
    }

    val out = new java.io.ByteArrayOutputStream()
    def rec(op: Int, body: Array[Byte]): Unit = {
      require(body.length <= 8224, s"BIFF record 0x${op.toHexString} overflows")
      val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(op.toShort).putShort(body.length.toShort).put(body)
      out.write(b.array())
    }
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

    // ---- shared-string table (r6): cells past the 255-char inline-Label
    // cap (MS-XLS 2.4.148) round-trip through SST + LABELSST instead of
    // truncating; only >4000 chars still truncates (a string must fit one
    // record — XLS stays the report-scale sink). Strings dedupe: cstTotal
    // counts references, cstUnique the table entries.
    val SstMax = 4000
    def sstKey(s: String): String = if (s.length <= SstMax) s else s.take(SstMax)
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var sstRefs = 0
    collected.foreach { case (_, header, data, numeric) =>
      def visit(s: String): Unit = if (s.length > 255) {
        sstRefs += 1
        val k = sstKey(s)
        if (!sstIndex.contains(k)) sstIndex(k) = sstIndex.size
      }
      header.foreach(visit)
      data.foreach { row =>
        var c = 0
        while (c < header.length) {
          row.get(c) match {
            case null =>
            case n: Number if numeric(c) =>
            case v => visit(v.toString)
          }
          c += 1
        }
      }
    }

    // BIFF8 unicode string body for LABEL/BOUNDSHEET: cch, grbit, chars
    // (compressed when every char fits a byte, else UTF-16LE)
    def uniStr(s0: String, cch16: Boolean): Array[Byte] = {
      // Inline LABEL (0x0204) caps cch at 255 (MS-XLS 2.4.148); longer
      // cell strings never reach here — label() routes them through
      // SST + LABELSST. The cap is defensive for other callers
      // (BOUNDSHEET names are ≤31 by the require above).
      val max = 255
      val s = if (s0.length <= max) s0 else s0.take(max)
      val high = s.exists(_ >= 0x100)
      val b = le((if (cch16) 2 else 1) + 1 + s.length * (if (high) 2 else 1))
      if (cch16) b.putShort(s.length.toShort) else b.put(s.length.toByte)
      b.put((if (high) 1 else 0).toByte)
      if (high) s.foreach(c => b.putShort(c.toShort))
      else s.foreach(c => b.put(c.toByte))
      b.array()
    }

    def bof(dt: Int): Array[Byte] =
      le(16).putShort(0x0600.toShort).putShort(dt.toShort)
        .putShort(0x0DBB.toShort).putShort(0x07CC.toShort)
        .putInt(0x000000C1).putInt(0x00000006).array()

    // ---- workbook globals substream
    rec(0x0809, bof(0x0005))
    rec(0x0042, le(2).putShort(1200.toShort).array()) // CODEPAGE: UTF-16
    rec(0x003D, le(18).putShort(0x0168.toShort).putShort(0x0078.toShort)
      .putShort(0x3A5C.toShort).putShort(0x23F0.toShort)
      .putShort(0x0038.toShort).putShort(0.toShort).putShort(0.toShort)
      .putShort(1.toShort).putShort(0x0258.toShort).array()) // WINDOW1
    // FONT ×5: Excel skips font index 4, so five records cover ixfnt 0–5
    val fontBody = {
      val name = "Arial"
      val b = le(14 + 2 + name.length * 2)
      b.putShort(200.toShort).putShort(0.toShort).putShort(0x7FFF.toShort)
        .putShort(400.toShort).putShort(0.toShort)
        .put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .put(name.length.toByte).put(1.toByte)
      name.foreach(c => b.putShort(c.toShort))
      b.array()
    }
    (0 until 5).foreach(_ => rec(0x0031, fontBody))
    // XF ×16: 15 style XFs + the cell XF every cell record points at (15)
    def xf(style: Boolean): Array[Byte] = {
      val b = le(20)
      b.putShort(0.toShort).putShort(0.toShort)
        .putShort((if (style) 0xFFF5 else 0x0001).toShort)
        .put(0x20.toByte).put(0.toByte)
      b.put(new Array[Byte](12))
      b.array()
    }
    (0 until 15).foreach(_ => rec(0x00E0, xf(style = true)))
    rec(0x00E0, xf(style = false))
    // BOUNDSHEETs: sheet-BOF offsets patched after the substreams land
    val boundsheetAts = collected.map { case (name, _, _, _) =>
      val at = out.size()
      rec(0x0085, {
        val n = uniStr(name, cch16 = false)
        le(6 + n.length).putInt(0).putShort(0.toShort).put(n).array()
      })
      at
    }
    if (sstIndex.nonEmpty) {
      // serialize the table into SST + CONTINUE chunks, splitting at
      // STRING boundaries only (each string caps at SstMax, so one always
      // fits a record — no mid-string option-flag restarts to emit)
      val chunkCap = 8220
      val chunks = scala.collection.mutable.ArrayBuffer(
        new java.io.ByteArrayOutputStream())
      chunks.last.write(le(8).putInt(sstRefs).putInt(sstIndex.size).array())
      val strPos = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      sstIndex.keysIterator.foreach { s =>
        val high = s.exists(_ >= 0x100)
        val b = le(3 + s.length * (if (high) 2 else 1))
        b.putShort(s.length.toShort).put((if (high) 1 else 0).toByte)
        if (high) s.foreach(c => b.putShort(c.toShort))
        else s.foreach(c => b.put(c.toByte))
        val bytes = b.array()
        if (chunks.last.size() + bytes.length > chunkCap)
          chunks += new java.io.ByteArrayOutputStream()
        strPos += ((chunks.length - 1, chunks.last.size()))
        chunks.last.write(bytes)
      }
      val recStarts = chunks.zipWithIndex.map { case (c, i) =>
        val at = out.size()
        rec(if (i == 0) 0x00FC else 0x003C, c.toByteArray) // SST, CONTINUE…
        at
      }
      // EXTSST (0x00FF): the string-position index Excel expects — one
      // ISSTINF per Dsst-th string: absolute stream position + offset
      // within its carrying record (4-byte header included)
      val dsst = math.max(8, (sstIndex.size + 127) / 128)
      val infos = strPos.zipWithIndex.collect {
        case ((ci, off), i) if i % dsst == 0 =>
          (recStarts(ci) + 4 + off, off + 4)
      }
      val eb = le(2 + infos.length * 8).putShort(dsst.toShort)
      infos.foreach { case (ib, cb) =>
        eb.putInt(ib).putShort(cb.toShort).putShort(0.toShort)
      }
      rec(0x00FF, eb.array())
    }
    rec(0x000A, Array.emptyByteArray) // EOF (globals)

    // ---- worksheet substreams
    val sheetBofs = collected.map { case (_, header, data, numeric) =>
      val sheetBof = out.size()
      rec(0x0809, bof(0x0010))
      rec(0x0200, le(14).putInt(0).putInt(data.length + 1)
        .putShort(0.toShort).putShort(header.length.toShort)
        .putShort(0.toShort).array()) // DIMENSIONS
      def label(rw: Int, c: Int, s: String): Unit =
        if (s.length > 255) // SST-backed cell (see the table build above)
          rec(0x00FD, le(10).putShort(rw.toShort).putShort(c.toShort)
            .putShort(15.toShort).putInt(sstIndex(sstKey(s))).array())
        else {
          val u = uniStr(s, cch16 = true)
          rec(0x0204, le(6 + u.length).putShort(rw.toShort).putShort(c.toShort)
            .putShort(15.toShort).put(u).array())
        }
      def number(rw: Int, c: Int, v: Double): Unit =
        rec(0x0203, le(14).putShort(rw.toShort).putShort(c.toShort)
          .putShort(15.toShort).putDouble(v).array())
      header.zipWithIndex.foreach { case (h, c) => label(0, c, h) }
      data.zipWithIndex.foreach { case (row, i) =>
        var c = 0
        while (c < header.length) {
          row.get(c) match {
            case null => // blank
            case n: Number if numeric(c) => number(i + 1, c, n.doubleValue())
            case v => label(i + 1, c, v.toString)
          }
          c += 1
        }
      }
      rec(0x000A, Array.emptyByteArray) // EOF (sheet)
      sheetBof
    }

    val wb = out.toByteArray
    // patch each BOUNDSHEET's stream position (record header is 4 bytes)
    val patched = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    boundsheetAts.zip(sheetBofs).foreach { case (at, bofOff) =>
      patched.putInt(at + 4, bofOff)
    }
    writeCfb(path, wb)
  }

  /** Minimal OLE2/CFB container: header-inline DIFAT, FAT chain, one
    * directory sector (Root + Workbook), workbook as a REGULAR stream —
    * padded to the 4096-byte mini cutoff so no mini-FAT machinery is
    * needed (trailing zeros after the BIFF EOF are inert to readers,
    * which stop at the EOF record). */
  private def writeCfb(path: String, workbook: Array[Byte]): Unit = {
    val FatSect = 0xFFFFFFFD
    val wb = if (workbook.length >= 4096) workbook
      else java.util.Arrays.copyOf(workbook, 4096)
    val wbSectors = (wb.length + 511) / 512
    // fixed point: nFat FAT sectors must index themselves + dir + workbook
    var nFat = 1
    var settled = false
    while (!settled) {
      val need = ((nFat + 1 + wbSectors) * 4 + 511) / 512
      if (need == nFat) settled = true else nFat = need
    }
    require(nFat <= 109, s"XLS too large for header-inline DIFAT (${wb.length} bytes)")
    val totalSectors = nFat + 1 + wbSectors
    val fat = Array.fill(nFat * 128)(FreeSect)
    (0 until nFat).foreach(i => fat(i) = FatSect)
    fat(nFat) = EndOfChain // directory: single sector
    (0 until wbSectors).foreach { i =>
      fat(nFat + 1 + i) = if (i == wbSectors - 1) EndOfChain else nFat + 2 + i
    }

    val buf = ByteBuffer.allocate(512 + totalSectors * 512)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    buf.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    buf.put(new Array[Byte](16)) // CLSID
    buf.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor/major
    buf.putShort(0xFFFE.toShort) // little-endian mark
    buf.putShort(9.toShort).putShort(6.toShort) // sector/mini shifts
    buf.put(new Array[Byte](6))
    buf.putInt(0) // v3: no directory-sector count
    buf.putInt(nFat)
    buf.putInt(nFat) // first directory sector
    buf.putInt(0) // transaction
    buf.putInt(4096) // mini cutoff
    buf.putInt(EndOfChain).putInt(0) // no mini FAT
    buf.putInt(EndOfChain).putInt(0) // no DIFAT sectors
    (0 until 109).foreach(i => buf.putInt(if (i < nFat) i else FreeSect))
    // FAT sectors
    fat.foreach(buf.putInt)
    // directory sector: Root Entry + Workbook + two unused
    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Unit = {
      val begin = buf.position()
      name.foreach(c => buf.putShort(c.toShort))
      buf.putShort(0.toShort)
      buf.position(begin + 64)
      buf.putShort(((name.length + 1) * 2).toShort)
      buf.put(typ.toByte).put(1.toByte) // black
      buf.putInt(-1).putInt(-1).putInt(child)
      buf.put(new Array[Byte](36)) // CLSID + state + times
      buf.putInt(start).putInt(size).putInt(0)
    }
    dirEntry("Root Entry", 5, 1, EndOfChain, 0)
    dirEntry("Workbook", 2, -1, nFat + 1, wb.length)
    buf.put(new Array[Byte](256)) // two unused entries
    // workbook stream sectors
    buf.put(wb)
    buf.put(new Array[Byte](wbSectors * 512 - wb.length))
    Files.write(Paths.get(path), buf.array())
  }
}

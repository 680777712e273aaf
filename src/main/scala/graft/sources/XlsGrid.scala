package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** Minimal BIFF8 `.xls` reader — closes the last ingestion gap vs the
  * reference, which points pandas straight at the downloaded workbook
  * (`/root/reference/src/transform_pipeline.py:23-30`,
  * `pd.read_excel(..., dtype=str)`): every sheet becomes an all-string
  * grid suitable for [[OrderedScan.fromGrid]], so the homologation
  * pipeline runs off the real binary artifact instead of a
  * pre-converted CSV.
  *
  * Implemented from the PUBLIC format documentation only ([MS-CFB] for
  * the compound-file container, [MS-XLS]/OpenOffice "Excel File Format"
  * for the BIFF8 records) — both FAT and miniFAT stream paths (small
  * workbooks really do live in the ministream), SST with CONTINUE-split
  * unicode strings, and the LABELSST / LABEL / NUMBER / RK / MULRK /
  * BLANK / MULBLANK / BOOLERR / FORMULA+STRING cell records. Unknown
  * records are skipped — readers must tolerate the long tail of
  * feature records real writers emit.
  *
  * DRIVER-SIDE by design, like the reference's ingestion: one workbook
  * is a bounded artifact (the 3CV file is a few MB); the distributed
  * part of the pipeline starts at the grid DataFrame this produces.
  *
  * String rendering of numeric cells: integral doubles render without a
  * decimal point (`1500`, not pandas' `1500.0`) — the established
  * contract of the grid the downstream stages parse
  * ([[graft.pipeline.Homologation]] casts `"1500"`/`"15.5"`-shaped
  * cells); the deviation from `astype(str)` is deliberate and pinned by
  * IngestSpec. */
object XlsGrid {

  // ---------------------------------------------------------------- CFB

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF.toInt

  private final class Cfb(bytes: Array[Byte]) {
    private def u16(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    private def i32(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)

    require(bytes.length >= 512, "xls: file shorter than a CFB header")
    require((0 until 8).map(i => bytes(i) & 0xFF) ==
      Seq(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1),
      "xls: not a compound (OLE2) file — xlsx/zip containers are a different format")

    private val sectorShift = u16(30)
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(32)
    private val miniSize = 1 << miniShift
    private val numFatSectors = i32(44)
    private val firstDirSector = i32(48)
    private val miniCutoff = i32(56)
    private val firstMiniFatSector = i32(60)
    private val firstDifatSector = i32(68)
    private val numDifatSectors = i32(72)

    private def sectorOff(sect: Int): Int = 512 + sect * sectorSize

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    private val fatSectors: Seq[Int] = {
      val fromHeader = (0 until 109).map(i => i32(76 + 4 * i)).filter(_ != FreeSect)
      val extra = mutable.ArrayBuffer.empty[Int]
      var difat = firstDifatSector
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard <= numDifatSectors + 1) {
        val base = sectorOff(difat)
        val perSector = sectorSize / 4 - 1
        (0 until perSector).foreach { i =>
          val v = i32(base + 4 * i)
          if (v != FreeSect) extra += v
        }
        difat = i32(base + 4 * perSector)
        guard += 1
      }
      (fromHeader ++ extra).take(numFatSectors)
    }

    private val fat: Array[Int] = {
      val entriesPerSector = sectorSize / 4
      val out = new Array[Int](fatSectors.length * entriesPerSector)
      fatSectors.zipWithIndex.foreach { case (s, i) =>
        val base = sectorOff(s)
        (0 until entriesPerSector).foreach(j => out(i * entriesPerSector + j) = i32(base + 4 * j))
      }
      out
    }

    private def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start
      while (s != EndOfChain && s != FreeSect) {
        require(s >= 0 && s < table.length, s"xls: sector chain escapes the FAT ($s)")
        require(out.length <= table.length, "xls: cyclic sector chain")
        out += s
        s = table(s)
      }
      out.toSeq
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val sects = chain(start, fat)
      val out = new Array[Byte]((sects.length.toLong * sectorSize).toInt)
      sects.zipWithIndex.foreach { case (s, i) =>
        System.arraycopy(bytes, sectorOff(s), out, i * sectorSize, sectorSize)
      }
      out.take(math.min(size, out.length.toLong).toInt)
    }

    // directory entries, flattened; start sector at 116, 32-bit size at
    // 120 (v3 files zero the high dword)
    private val dirBytes = readChain(firstDirSector, Long.MaxValue / 2)
    private case class DirEntry(name: String, objType: Int, startSector: Int, size: Long)
    private val entries: Seq[DirEntry] = (0 until dirBytes.length / 128).map { i =>
      val base = i * 128
      def du16(o: Int) = (dirBytes(base + o) & 0xFF) | ((dirBytes(base + o + 1) & 0xFF) << 8)
      def di32(o: Int) = du16(o) | (du16(o + 2) << 16)
      val nameLen = du16(64)
      val name = if (nameLen >= 2)
        new String(dirBytes, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      DirEntry(name, dirBytes(base + 66) & 0xFF, di32(116), di32(120).toLong & 0xFFFFFFFFL)
    }

    private val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("xls: no root directory entry"))

    private val miniFat: Array[Int] =
      if (firstMiniFatSector == EndOfChain || firstMiniFatSector == FreeSect) Array.empty
      else {
        val raw = readChain(firstMiniFatSector, Long.MaxValue / 2)
        val out = new Array[Int](raw.length / 4)
        (0 until out.length).foreach { j =>
          out(j) = (raw(4 * j) & 0xFF) | ((raw(4 * j + 1) & 0xFF) << 8) |
            ((raw(4 * j + 2) & 0xFF) << 16) | ((raw(4 * j + 3) & 0xFF) << 24)
        }
        out
      }

    private lazy val miniStream: Array[Byte] = readChain(root.startSector, root.size)

    /** The named stream's bytes, via the regular FAT or (below the 4096
      * cutoff) the ministream + miniFAT. */
    def stream(name: String): Array[Byte] = {
      val e = entries.find(d => d.objType == 2 && d.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"xls: no '$name' stream (have: ${entries.filter(_.objType == 2).map(_.name).mkString(", ")})"))
      if (e.size >= miniCutoff) readChain(e.startSector, e.size)
      else {
        val out = new Array[Byte](e.size.toInt)
        var written = 0
        var s = e.startSector
        while (written < e.size && s != EndOfChain && s != FreeSect) {
          val n = math.min(miniSize, e.size.toInt - written)
          System.arraycopy(miniStream, s * miniSize, out, written, n)
          written += n
          require(s >= 0 && s < miniFat.length, s"xls: mini chain escapes the miniFAT ($s)")
          s = miniFat(s)
        }
        require(written == e.size, s"xls: '$name' ministream truncated ($written of ${e.size})")
        out
      }
    }
  }

  // --------------------------------------------------------------- BIFF

  private final case class Record(id: Int, at: Int, data: Array[Byte])

  private def records(wb: Array[Byte]): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var off = 0
    def u16(o: Int) = (wb(o) & 0xFF) | ((wb(o + 1) & 0xFF) << 8)
    while (off + 4 <= wb.length) {
      val id = u16(off)
      val len = u16(off + 2)
      if (id == 0) off = wb.length // zero-fill tail of the last sector
      else {
        out += Record(id, off, java.util.Arrays.copyOfRange(wb, off + 4, off + 4 + len))
        off += 4 + len
      }
    }
    out.result()
  }

  /** Cursor over a primary record plus its CONTINUE records; BIFF8
    * unicode strings may break at any CONTINUE boundary, where the
    * compression flag byte is RE-EMITTED — the part of the format that
    * makes naive SST readers corrupt long string tables. */
  private final class RecCursor(parts: Seq[Array[Byte]]) {
    private var part = 0
    private var off = 0
    private def ensure(): Unit = {
      while (part < parts.length && off >= parts(part).length) { part += 1; off = 0 }
      require(part < parts.length, "xls: record data exhausted mid-field")
    }
    def u8(): Int = { ensure(); val v = parts(part)(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8())
    /** `n` UTF-16 code units under the CURRENT compression flag, re-read
      * at each continuation boundary. */
    def chars(n: Int, initialCompressed: Boolean): String = {
      var compressed = initialCompressed
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        ensure()
        if (off == 0 && part > 0 && i > 0) compressed = (u8() & 1) == 0
        if (compressed) sb.append((u8()).toChar)
        else sb.append(u16().toChar)
        i += 1
      }
      sb.toString
    }
    /** Full BIFF8 unicode string: 16-bit char count. */
    def xlUnicodeString(): String = {
      val n = u16()
      val grbit = u8()
      val compressed = (grbit & 0x01) == 0
      val hasExt = (grbit & 0x04) != 0
      val hasRich = (grbit & 0x08) != 0
      val cRun = if (hasRich) u16() else 0
      val cbExt = if (hasExt) i32() else 0
      val s = chars(n, compressed)
      skip(cRun * 4)
      skip(cbExt)
      s
    }
  }

  private def shortUnicode(d: Array[Byte], off: Int): String = {
    val n = d(off) & 0xFF
    val compressed = (d(off + 1) & 0x01) == 0
    if (compressed) new String(d, off + 2, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    else new String(d, off + 2, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
  }

  private def u16(d: Array[Byte], o: Int): Int = (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8)
  private def i32(d: Array[Byte], o: Int): Int = u16(d, o) | (u16(d, o + 2) << 16)

  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** pandas-adjacent numeric rendering with the grid contract's integral
    * exception: 1500.0 → "1500" (not "1500.0"), 15.5 → "15.5". */
  private def numStr(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Every sheet of the workbook as (name, all-string grid); `null`
    * marks blank/absent cells, grids are rectangular over the max
    * row/col actually populated. */
  def readSheets(path: String): Seq[(String, Vector[Vector[String]])] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    // Excel writes "Workbook" for BIFF8; very old files use "Book"
    val wb = try cfb.stream("Workbook") catch {
      case _: IllegalArgumentException => cfb.stream("Book")
    }
    val recs = records(wb)

    // globals: SST + BOUNDSHEETs
    val sst = mutable.ArrayBuffer.empty[String]
    val sheets = mutable.ArrayBuffer.empty[(String, Int)] // (name, stream offset)
    var i = 0
    var inGlobals = true
    while (i < recs.length && inGlobals) {
      val r = recs(i)
      r.id match {
        case 0x0085 => // BOUNDSHEET
          sheets += ((shortUnicode(r.data, 6), i32(r.data, 0)))
        case 0x00FC => // SST (+ CONTINUEs)
          val parts = mutable.ArrayBuffer(r.data)
          var j = i + 1
          while (j < recs.length && recs(j).id == 0x003C) { parts += recs(j).data; j += 1 }
          val cur = new RecCursor(parts.toSeq)
          cur.i32() // total refs
          val unique = cur.i32()
          (0 until unique).foreach(_ => sst += cur.xlUnicodeString())
        case 0x000A => inGlobals = false // EOF of globals substream
        case _ =>
      }
      i += 1
    }

    sheets.toSeq.map { case (name, bofOffset) =>
      val start = recs.indexWhere(_.at == bofOffset)
      require(start >= 0, s"xls: BOUNDSHEET points at offset $bofOffset with no record")
      val cells = mutable.HashMap.empty[(Int, Int), String]
      var maxRow = -1
      var maxCol = -1
      def put(row: Int, c: Int, v: String): Unit = {
        if (v != null) cells((row, c)) = v
        if (row > maxRow) maxRow = row
        if (c > maxCol) maxCol = c
      }
      var k = start + 1
      var open = true
      while (k < recs.length && open) {
        val r = recs(k)
        val d = r.data
        r.id match {
          case 0x000A => open = false
          case 0x00FD => // LABELSST — empty text cells stay "", not null
            put(u16(d, 0), u16(d, 2), sst(i32(d, 6)))
          case 0x0204 => // LABEL (inline string)
            val cur = new RecCursor(Seq(java.util.Arrays.copyOfRange(d, 6, d.length)))
            put(u16(d, 0), u16(d, 2), cur.xlUnicodeString())
          case 0x0203 => // NUMBER
            put(u16(d, 0), u16(d, 2), numStr(
              java.lang.Double.longBitsToDouble(ByteBuffer.wrap(d, 6, 8)
                .order(ByteOrder.LITTLE_ENDIAN).getLong)))
          case 0x027E => // RK
            put(u16(d, 0), u16(d, 2), numStr(rkValue(i32(d, 6))))
          case 0x00BD => // MULRK
            val row = u16(d, 0)
            val c0 = u16(d, 2)
            val n = (d.length - 6) / 6
            (0 until n).foreach(m => put(row, c0 + m, numStr(rkValue(i32(d, 4 + 6 * m + 2)))))
          case 0x0201 => // BLANK
            put(u16(d, 0), u16(d, 2), null)
          case 0x00BE => // MULBLANK
            val row = u16(d, 0)
            val c0 = u16(d, 2)
            val n = (d.length - 6) / 2
            (0 until n).foreach(m => put(row, c0 + m, null))
          case 0x0205 => // BOOLERR
            val v = d(6) & 0xFF
            val isErr = (d(7) & 0xFF) == 1
            put(u16(d, 0), u16(d, 2),
              if (isErr) null else if (v != 0) "True" else "False")
          case 0x0006 => // FORMULA: cached numeric / string / bool result
            val row = u16(d, 0)
            val c = u16(d, 2)
            if ((d(12) & 0xFF) == 0xFF && (d(13) & 0xFF) == 0xFF) {
              d(6) & 0xFF match {
                case 0 => // string result follows in a STRING record
                  var j = k + 1
                  while (j < recs.length && recs(j).id == 0x003C) j += 1
                  if (j < recs.length && recs(j).id == 0x0207) {
                    val cur = new RecCursor(Seq(recs(j).data))
                    val s = cur.xlUnicodeString()
                    put(row, c, if (s.isEmpty) null else s)
                  }
                case 1 => put(row, c, if ((d(8) & 0xFF) != 0) "True" else "False")
                case _ => put(row, c, null) // error / empty cell
              }
            } else put(row, c, numStr(
              java.lang.Double.longBitsToDouble(ByteBuffer.wrap(d, 6, 8)
                .order(ByteOrder.LITTLE_ENDIAN).getLong)))
          case _ =>
        }
        k += 1
      }
      val grid = (0 to maxRow).map { r =>
        (0 to maxCol).map(c => cells.getOrElse((r, c), null): String).toVector
      }.toVector
      (name, grid)
    }
  }
}

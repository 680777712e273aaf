package graft.sources

import java.util.zip.ZipFile

import scala.collection.mutable
import scala.xml.{Elem, XML}

/** Minimal OOXML `.xlsx` reader — the container twin of [[XlsGrid]]:
  * the reference points `pd.read_excel` at whatever the 3CV site serves
  * (`/root/reference/src/transform_pipeline.py:23-30`; the extraction
  * layer's filetype is env-parametrized, `extraction.py:45-98`), and
  * pandas dispatches on the container. This closes the `.xlsx` half so a
  * format flip upstream cannot break ingestion: every sheet becomes the
  * same all-string grid [[OrderedScan.fromGrid]] consumes, byte-for-byte
  * interchangeable with the BIFF8 path (pinned by XlsxGridSpec against
  * the `.xls` twin fixture).
  *
  * Implemented from the PUBLIC ECMA-376 documentation only: ZIP package
  * (JDK `ZipFile`), `xl/workbook.xml` sheet list in document order,
  * `xl/_rels/workbook.xml.rels` r:id→part resolution, shared strings
  * with plain `<t>` and rich-text `<r><t>` runs (phonetic `<rPh>` runs
  * excluded), and worksheet `<c>` cells of types s / str / inlineStr /
  * b / e / n-or-default, with sequential positioning when the `r`
  * attribute is omitted (writers may drop it; consumers must infer).
  *
  * DRIVER-SIDE by design, like the reference's ingestion — one workbook
  * is a bounded artifact; distribution starts at the grid DataFrame.
  *
  * Cell rendering matches the [[XlsGrid]] grid contract exactly:
  * integral doubles drop the decimal point (`1500`, not `1500.0`),
  * booleans render `True`/`False`, error cells and blanks are null,
  * empty shared/inline strings stay `""` (a typed-empty cell is not a
  * blank), and an empty formula-string result is null. */
object XlsxGrid {

  private def numStr(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** "BC" → 54 (0-based). */
  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  /** Rich-text-aware string assembly: direct `<t>` plus each run's
    * `<t>`, skipping phonetic annotations. */
  private def richText(e: scala.xml.Node): String =
    (e \ "t").text + (e \ "r").map(r => (r \ "t").text).mkString

  private def loadEntry(zip: ZipFile, name: String): Elem = {
    val entry = zip.getEntry(name)
    require(entry != null, {
      import scala.jdk.CollectionConverters._
      s"xlsx: package part '$name' missing " +
        s"(have: ${zip.entries().asScala.take(20).map(_.getName).mkString(", ")})"
    })
    val in = zip.getInputStream(entry)
    try XML.load(in) finally in.close()
  }

  /** Every sheet of the workbook as (name, all-string grid), workbook
    * document order; `null` marks blank/absent cells, grids are
    * rectangular over the max row/col a cell element actually names
    * (a valueless `<c>` extends the envelope like a BIFF BLANK). */
  def readSheets(path: String): Seq[(String, Vector[Vector[String]])] = {
    val zip = new ZipFile(path)
    try {
      val wb = loadEntry(zip, "xl/workbook.xml")
      val rels = loadEntry(zip, "xl/_rels/workbook.xml.rels")
      val relTarget: Map[String, String] = (rels \ "Relationship").map { r =>
        val target = (r \@ "Target").stripPrefix("/")
        (r \@ "Id") -> (if (target.startsWith("xl/")) target else s"xl/$target")
      }.toMap

      val shared: IndexedSeq[String] =
        if (zip.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
        else (loadEntry(zip, "xl/sharedStrings.xml") \ "si").map(richText).toIndexedSeq

      (wb \ "sheets" \ "sheet").map { s =>
        val name = s \@ "name"
        // r:id lives in the officeDocument relationships namespace
        val rid = s.attributes.collectFirst {
          case a if a.key == "id" && a.value != null => a.value.text
        }.getOrElse(throw new IllegalArgumentException(s"xlsx: sheet '$name' has no r:id"))
        val part = relTarget.getOrElse(rid,
          throw new IllegalArgumentException(s"xlsx: unresolved relationship '$rid'"))
        (name, readSheet(loadEntry(zip, part), shared))
      }
    } finally zip.close()
  }

  private def readSheet(
      sheet: Elem, shared: IndexedSeq[String]): Vector[Vector[String]] = {
    val cells = mutable.HashMap.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    var rowCursor = -1
    for (rowEl <- sheet \ "sheetData" \ "row") {
      val rAttr = rowEl \@ "r"
      rowCursor = if (rAttr.nonEmpty) rAttr.toInt - 1 else rowCursor + 1
      var colCursor = -1
      for (c <- rowEl \ "c") {
        val ref = c \@ "r"
        colCursor =
          if (ref.nonEmpty) colIndex(ref.takeWhile(_.isLetter))
          else colCursor + 1
        val v = cellValue(c, shared)
        if (v != null) cells((rowCursor, colCursor)) = v
        if (rowCursor > maxRow) maxRow = rowCursor
        if (colCursor > maxCol) maxCol = colCursor
      }
    }
    (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.getOrElse((r, c), null): String).toVector
    }.toVector
  }

  private def cellValue(c: scala.xml.Node, shared: IndexedSeq[String]): String = {
    val v = (c \ "v").text
    (c \@ "t") match {
      case "s"         => shared((v.trim).toInt)
      case "inlineStr" => (c \ "is").headOption.map(richText).getOrElse(null)
      case "str"       => if (v.isEmpty) null else v // cached formula string
      case "b"         => if (v.trim == "1") "True" else "False"
      case "e"         => null
      case _           => // n or untyped: numeric when a value exists
        if ((c \ "v").isEmpty) null else numStr(v.trim.toDouble)
    }
  }
}

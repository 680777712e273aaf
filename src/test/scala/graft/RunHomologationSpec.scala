package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineQueries
import graft.sources.OrderedScan

/** The runnable EP2+EP3 CLI driven through a CSV round-trip, including
  * the CRLF hazard (python csv writers emit \r\n; the multiLine parser
  * leaves \r in the record's last cell unless the grid reader strips it —
  * a silent header-detection killer, regression-pinned here). */
class RunHomologationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csvGrid round-trips a CRLF grid with embedded-newline headers") {
    val grid = PipelineQueries.demoGrid(spark)
    val rows = grid.orderBy("_row_idx").drop("_row_idx").collect()
    def quote(v: String) = "\"" + v.replace("\"", "\"\"") + "\""
    val csv = rows.map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") || s.contains("\n") || s.contains("\"") => quote(s)
      case s => s.toString
    }.mkString(",")).mkString("\r\n") + "\r\n" // CRLF on purpose
    val f = Files.createTempFile("grid", ".csv")
    Files.writeString(f, csv)

    val reread = OrderedScan.csvGrid(spark, f.toString)
    // "" and null are indistinguishable in CSV and equivalent to the
    // pipeline (transformCategoryCols coalesces to "" first)
    def canon(s: Seq[Any]) = s.map { case "" => null; case v => v }
    val a = grid.orderBy("_row_idx").collect().map(r => canon(r.toSeq))
    val b = reread.orderBy("_row_idx").collect().map(r => canon(r.toSeq))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("RunHomologation main publishes the year-ranged CSV and mapping store") {
    val grid = PipelineQueries.demoGrid(spark)
    val rows = grid.orderBy("_row_idx").drop("_row_idx").collect()
    def quote(v: String) = "\"" + v.replace("\"", "\"\"") + "\""
    val csv = rows.map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") || s.contains("\n") || s.contains("\"") => quote(s)
      case s => s.toString
    }.mkString(",")).mkString("\n") + "\n"
    val f = Files.createTempFile("grid2", ".csv")
    Files.writeString(f, csv)
    val outDir = Files.createTempDirectory("hom_out")
    val mapping = outDir.resolve("mapping.json")

    graft.pipeline.RunHomologation.main(Array(
      f.toString, "/root/reference/data/processed/bd-importadores.csv",
      outDir.toString, mapping.toString))

    val published = outDir.resolve("datos3cv_2013-2014.csv")
    assert(Files.isDirectory(published), s"missing $published")
    val lines = Files.list(published).toArray.map(_.toString)
      .filter(_.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines().toSeq)
    assert(lines.length == 4) // header + 3 rows
    assert(lines.head.startsWith("MARCA,MODELO,FECHA_HOML"))
    assert(Files.exists(mapping))
  }
}

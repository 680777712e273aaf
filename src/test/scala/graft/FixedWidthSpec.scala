package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FixedWidth
import graft.sources.FixedWidth.Field

/** Positional reader: copybook-style slicing, padding trim, short/long
  * line tolerance, coerce-to-null casts. */
class FixedWidthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val layout = Seq(
    Field("id", 1, 5, Some("bigint")),
    Field("name", 6, 8),
    Field("amount", 14, 7, Some("double")))

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("fixedwidth").toFile
    val f = new java.io.File(dir, "data.txt")
    Files.writeString(f.toPath, lines.mkString("\n") + "\n")
    f.getAbsolutePath
  }

  test("slices, trims padding, casts; short lines yield NULL tails") {
    // exact widths: id 5 | name 8 | amount 7
    val path = write(
      "00001" + "alice   " + "  12.50",
      "00002" + "bob     " + "99999.9",
      "00003" + "carol",               // short: amount slice empty → NULL
      "0000X" + "dave    " + "   1.00" // uncastable id → NULL (coerce, not crash)
    )
    val out = FixedWidth.read(spark, path, layout).orderBy("name").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      (Some(1L), "alice", Some(12.5)),
      (Some(2L), "bob", Some(99999.9)),
      (Some(3L), "carol", None),
      (None, "dave", Some(1.0))))
  }

  test("overlapping-free layout validation and duplicate names rejected") {
    assertThrows[IllegalArgumentException] {
      FixedWidth.read(spark, "/nonexistent", Seq(
        Field("a", 1, 3), Field("a", 4, 3)))
    }
    assertThrows[IllegalArgumentException] { Field("bad", 0, 3) }
    assertThrows[IllegalArgumentException] { Field("bad", 1, 0) }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Quarantine

/** Malformed-row quarantine: all three malformation kinds (uncastable
  * cell, under-length row, over-length row) must land in `bad` with
  * their raw line, and `good` must carry exactly the declared schema. */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("quarantine").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath, lines.mkString("\n") + "\n")
    f.getAbsolutePath
  }

  test("good/bad split: type failure, arity under, arity over all quarantined") {
    val path = write("id,name,score",
      "1,alice,3.5", "2,bob,notanumber", "3,carol,2.0",
      "4,dave", "5,eve,1.0,extra", "6,frank,2.5")
    val split = Quarantine.readCsv(spark, path, schema)
    val good = split.good.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(good.toSeq == Seq((1L, "alice", 3.5), (3L, "carol", 2.0), (6L, "frank", 2.5)))
    assert(split.good.columns.toSeq == Seq("id", "name", "score"))
    val bad = split.bad.collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Seq("2,bob,notanumber", "4,dave", "5,eve,1.0,extra"))
    split.done()
  }

  test("clean file: empty quarantine, all rows good") {
    val path = write("id,name,score", "1,a,1.0", "2,b,2.0")
    val split = Quarantine.readCsv(spark, path, schema)
    assert(split.good.count() == 2L && split.bad.count() == 0L)
    split.done()
  }

  test("schema declaring the corrupt column is rejected") {
    val badSchema = StructType(schema.fields :+
      StructField(Quarantine.CorruptCol, StringType))
    assertThrows[IllegalArgumentException] {
      Quarantine.readCsv(spark, "/nonexistent", badSchema)
    }
  }
}

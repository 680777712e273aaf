package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.sources.OrderedScan

/** ORC round-trip: schema, values, NULLs, arrays, and partition fan-out
  * survive the write/read cycle bit-for-bit. */
class OrcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("documents table round-trips through ORC unchanged") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val path = java.nio.file.Files.createTempDirectory("orc_docs").toString
    OrderedScan.writeOrc(docs, path)
    val back = OrderedScan.readOrc(spark, path)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("NULLs and array columns survive") {
    val df = Seq(
      (1L, Some("x"), Seq(1.0f, 2.0f)),
      (2L, None, Seq.empty[Float])
    ).toDF("id", "s", "vec")
    val path = java.nio.file.Files.createTempDirectory("orc_mixed").toString
    OrderedScan.writeOrc(df, path)
    val back = OrderedScan.readOrc(spark, path).orderBy("id").collect()
    assert(back(1).isNullAt(1) && back(0).getSeq[Float](2) == Seq(1.0f, 2.0f))
    assert(back(1).getSeq[Float](2).isEmpty)
  }

  test("multi-partition write keeps every row exactly once") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("g"))
    val path = java.nio.file.Files.createTempDirectory("orc_part").toString
    OrderedScan.writeOrc(df.repartition(8), path)
    val back = OrderedScan.readOrc(spark, path)
    assert(back.count() == 1000 && back.select(sum("id")).first().getLong(0) == 499500L)
  }
}

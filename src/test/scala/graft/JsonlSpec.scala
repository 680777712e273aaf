package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.sources.Jsonl

/** JSONL interchange: schema-pinned round-trip, gzip parts, and the
  * loud corrupt-record audit. */
class JsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("documents table round-trips through JSONL with a pinned schema") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val path = java.nio.file.Files.createTempDirectory("jsonl_docs").toString
    Jsonl.write(docs, path)
    val back = Jsonl.read(spark, path, docs.schema)
    assert(back.schema == docs.schema)
    assert(docs.orderBy("doc_id").collect().toSeq == back.orderBy("doc_id").collect().toSeq)
  }

  test("gzip sink writes .gz parts that read back identically") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val path = java.nio.file.Files.createTempDirectory("jsonl_gz").toString
    Jsonl.write(docs, path, gzip = true)
    val parts = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".json.gz")))
    val back = Jsonl.read(spark, path, docs.schema)
    assert(docs.orderBy("doc_id").collect().toSeq == back.orderBy("doc_id").collect().toSeq)
  }

  test("missing optional fields come back NULL, not as failures") {
    val path = java.nio.file.Files.createTempDirectory("jsonl_opt").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "a.jsonl"),
      "{\"id\": 1, \"s\": \"x\"}\n{\"id\": 2}\n".getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("s", "string")
    val back = Jsonl.read(spark, path, schema).orderBy("id").collect()
    assert(back.length == 2 && back(0).getString(1) == "x" && back(1).isNullAt(1))
  }

  test("corrupt lines are counted, and kept verbatim by readStrict") {
    val path = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "a.jsonl"),
      "{\"id\": 1}\nnot json at all\n{\"id\": 3}\n{broken\n".getBytes("UTF-8"))
    val schema = new org.apache.spark.sql.types.StructType().add("id", "long")
    assert(Jsonl.countCorrupt(spark, path, schema) == 2L)
    val parsed = Jsonl.readStrict(spark, path, schema).cache()
    val bad = parsed.where(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().sorted
    parsed.unpersist()
    assert(bad.toSeq == Seq("not json at all", "{broken"))
  }
}

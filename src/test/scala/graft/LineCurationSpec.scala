package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusOps, TextAnalysis}

/** Line-level curation: cross-document boilerplate removal (corpus
  * doc-frequency rule) and intra-document first-occurrence line dedup. */
class LineCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("boilerplate lines cut by corpus doc-frequency, prose survives in order") {
    val docs = Seq(
      (1L, "alpha prose one\nsubscribe now\nbeta prose two"),
      (2L, "gamma text here\nsubscribe now\ncopyright acme"),
      (3L, "subscribe now\ndelta line\ncopyright acme"),
      (4L, "epsilon words\ncopyright acme\nzeta tail")).toDF("doc_id", "text")
    val out = CorpusOps.boilerplateLines(docs, minDocFreq = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "subscribe now" (df 3) and "copyright acme" (df 3) are template;
    // every prose line has df 1
    assert(out(0) == ((1L, 3L, 2L, md5Of("alpha prose one\nbeta prose two"))))
    assert(out(1) == ((2L, 3L, 1L, md5Of("gamma text here"))))
    assert(out(2) == ((3L, 3L, 1L, md5Of("delta line"))))
    assert(out(3) == ((4L, 3L, 2L, md5Of("epsilon words\nzeta tail"))))
  }

  test("boilerplate df counts DISTINCT docs — in-doc repeats don't inflate") {
    val docs = Seq(
      (1L, "repeated line\nrepeated line\nrepeated line\nunique a"),
      (2L, "unique b")).toDF("doc_id", "text")
    // df("repeated line") = 1 distinct doc < 3 → kept everywhere
    val out = CorpusOps.boilerplateLines(docs, minDocFreq = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 4L)
    assert(out(1).getLong(2) == 1L)
  }

  test("all-boilerplate doc hashes the empty string, not NULL") {
    val docs = Seq(
      (1L, "same line"), (2L, "same line"), (3L, "same line")).toDF("doc_id", "text")
    val out = CorpusOps.boilerplateLines(docs, minDocFreq = 3)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getLong(2) == 0L)
      assert(r.getString(3) == md5Of(""))
    }
  }

  test("intra-doc dedup keeps the FIRST occurrence, order preserved") {
    val docs = Seq(
      (1L, "head\nbody one\nhead\nbody two\nbody one\nhead"),
      (2L, "only\nlines\nhere")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesWithin(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 6L, 3L, md5Of("head\nbody one\nbody two"))))
    assert(out(1) == ((2L, 3L, 3L, md5Of("only\nlines\nhere"))))
  }

  test("intra-doc dedup compares TRIMMED lines") {
    val docs = Seq((1L, "  pad  \npad\nother")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesWithin(docs).collect()(0)
    assert(out.getLong(2) == 2L)
    assert(out.getString(3) == md5Of("pad\nother"))
  }

  test("the two line ops agree with their exploded-formulation twins on real data") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        // fold flat prose into 5-token pseudo-lines so lines repeat
        concat_ws("\n",
          transform(
            sequence(lit(0), ceil(size(TextAnalysis.tokens(col("text"))) / lit(5.0)).cast("int") - 1),
            i => array_join(
              slice(TextAnalysis.tokens(col("text")), i * lit(5) + lit(1), lit(5)), " "))).as("text"))
      .where(length(col("text")) > 0)
    // exploded ground truth for dedupLinesWithin
    val exploded = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("line", trim(col("line")))
    val firsts = exploded.groupBy("doc_id", "line").agg(min("pos").as("pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
    val got = TextAnalysis.dedupLinesWithin(docs).select("doc_id", "n_kept")
    assert(got.except(firsts.select("doc_id", "n_kept")).isEmpty
      && firsts.select("doc_id", "n_kept").except(got).isEmpty)
  }
}

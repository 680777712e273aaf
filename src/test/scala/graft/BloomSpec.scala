package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps

/** BloomFilterAgg + bloomDecontam: no false negatives ever, merge = OR
  * across partitions (repartition-stable), and the bit set is exactly
  * the distinct hex-window set (the property the DuckDB oracle relies
  * on). */
class BloomSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq.tabulate(200)(i => (i.toLong, s"doc number $i body words")).toDF("doc_id", "text")

  test("bloomDecontam: every member probe hits; results repartition-stable") {
    val probes = corpus.limit(50)
      .select(col("doc_id").as("qid"), col("text"))
    val out = CorpusOps.bloomDecontam(corpus, probes, Seq("qid"))
    assert(out.where(col("bloom_hit") =!= 1 || col("exact_hit") =!= 1).count() == 0)
    val shuffled = CorpusOps.bloomDecontam(corpus.repartition(7), probes, Seq("qid"))
      .orderBy("qid").collect().toSeq
    assert(out.orderBy("qid").collect().toSeq == shuffled)
  }

  test("bloomDecontam: non-members miss (at 200 docs the FP odds are ~0) and exact_hit audits") {
    val probes = Seq((1L, "never seen text alpha"), (2L, "never seen text beta"))
      .toDF("qid", "text")
    val rows = CorpusOps.bloomDecontam(corpus, probes, Seq("qid"))
      .orderBy("qid").collect()
    rows.foreach { r => assert(r.getInt(2) == 0) } // exact_hit 0
    // 200 docs * 4 windows of 65536 bits -> per-window hit odds ~1.2%,
    // all-4 ~2e-8: a bloom_hit here would indicate broken hashing.
    rows.foreach { r => assert(r.getInt(1) == 0) }
  }

  test("bloom filter bit count equals the distinct hex-window count") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val hx = sha2(graft.ops.TextAnalysis.normText(col("text")), 256)
    val bf = corpus.select(hx.as("_hx"))
      .agg(toCol(graft.functions.BloomFilterAgg(toExpr(col("_hx")), 4, 4)
        .toAggregateExpression()).as("bf"))
      .select(aggregate(transform(col("bf"), w => bit_count(w)), lit(0), _ + _))
      .first().getInt(0)
    val windows = corpus.select(explode(transform(sequence(lit(0), lit(3)),
        j => hx.substr(lit(1) + j * lit(4), lit(4)))).as("w"))
      .distinct().count()
    assert(bf.toLong == windows)
  }
}

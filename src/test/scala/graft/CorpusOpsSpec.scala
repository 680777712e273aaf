package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.{CorpusOps, Packing, TextAnalysis}

/** Corpus-curation ops: content-addressed splits, length quantiles, and
  * sequence packing (blocked two-pass == global window, bit-equal). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("content split is deterministic and co-locates identical content") {
    val a = Seq(("hello  world", 1), ("hello world", 2), ("otra cosa", 3)).toDF("text", "id")
    val out = CorpusOps.withSplit(a).select("id", "split").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // whitespace-normalized fingerprint: reflowed duplicates share a split
    assert(out(1) == out(2))
    val again = CorpusOps.withSplit(a).select("id", "split").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == again)
  }

  test("split covers every row with the three labels, train dominant") {
    val counts = CorpusOps.withSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
  }

  test("length quantiles match a driver-side sorted computation") {
    val got = CorpusOps.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val lens = docs
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def q(xs: Seq[Double], p: Double): Double = {
      val rank = p * (xs.length - 1)
      val lo = xs(rank.toInt)
      val hi = xs(math.min(rank.toInt + 1, xs.length - 1))
      val frac = rank - rank.toInt
      math.rint((lo + frac * (hi - lo)) * 1e4) / 1e4
    }
    lens.foreach { case (lang, xs) =>
      val (p50, p90, p99) = got(lang)
      assert(math.abs(p50 - q(xs, 0.5)) < 1e-9, s"$lang p50")
      assert(math.abs(p90 - q(xs, 0.9)) < 1e-9, s"$lang p90")
      assert(math.abs(p99 - q(xs, 0.99)) < 1e-9, s"$lang p99")
    }
  }

  test("blocked packing is bit-equal to the global window, wide stages parallel") {
    val t = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val blocked = Packing.packSequences(t, "doc_id", "n_tokens", maxLen = 512, blockSize = 64)
      .orderBy("doc_id").collect().map(_.toSeq)
    val global = Packing.packSequencesGlobal(t, "doc_id", "n_tokens", maxLen = 512)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(blocked.toSeq == global.toSeq)
  }

  test("packing invariants: offsets contiguous, seq ids monotone, in-range") {
    val t = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val rows = Packing.packSequences(t, "doc_id", "n_tokens", maxLen = 512, blockSize = 64)
      .orderBy("doc_id")
      .select("n_tokens", "start_offset", "seq_id", "offset_in_seq")
      .collect()
    var expected = 0L
    var prevSeq = -1L
    rows.foreach { r =>
      assert(r.getLong(1) == expected, "offset must be the running token sum")
      expected += r.getLong(0)
      assert(r.getLong(2) >= prevSeq, "seq ids must be monotone")
      prevSeq = r.getLong(2)
      assert(r.getLong(3) >= 0 && r.getLong(3) < 512)
      assert(r.getLong(2) == r.getLong(1) / 512)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps

/** Native Misra–Gries aggregate: exactness below capacity, the
  * frequent-item guarantee under eviction, merge across partitions,
  * and the lower-bound property. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(tokens: Seq[String], parts: Int = 4) =
    tokens.map(t => Tuple1(t)).toDF("text").repartition(parts)

  test("below capacity the sketch is exact") {
    val toks = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(5)("gamma")
    val out = CorpusOps.heavyHitters(docsOf(scala.util.Random.shuffle(toks)), // fixed seed below
      capacity = 8, k = 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("alpha", 30L), ("beta", 20L), ("gamma", 5L)))
  }

  test("under eviction: frequent items survive with lower-bound counts") {
    val rnd = new scala.util.Random(11)
    // one dominant item at 40% + a long tail of singletons
    val n = 1000
    val toks = rnd.shuffle(
      Seq.fill(400)("whale") ++ (0 until 600).map(i => s"tail$i"))
    val out = CorpusOps.heavyHitters(docsOf(toks, parts = 8), capacity = 16, k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // MG guarantee: freq > n/(capacity+1) = 58.8 ⇒ whale must survive,
    // with a count underestimating 400 by at most n/(cap+1)
    assert(out.contains("whale"))
    assert(out("whale") <= 400L)
    assert(out("whale") >= 400L - n / (16 + 1) - 1)
    // every reported count is a lower bound on the true count
    out.foreach { case (tok, c) =>
      val truth = if (tok == "whale") 400L else 1L
      assert(c <= truth, s"$tok reported $c > true $truth")
    }
  }

  test("sketch on the real corpus equals exact vocabTopK in the no-eviction regime") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001", "documents")
    val sketch = CorpusOps.heavyHitters(docs, capacity = 64, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = CorpusOps.vocabTopK(docs, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.toSeq == exact.toSeq)
  }
}

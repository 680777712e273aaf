package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ann, Pq}

/** Product quantization: encode determinism, codes within codebook
  * range, ADC+refine finding planted neighbors, and the no-cartesian
  * plan property (the corpus-sized scan touches codes only). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 tight clusters on distinct axes + noise dims, 8-dim vectors
  private def clustered(nPer: Int): org.apache.spark.sql.DataFrame = {
    val rows = (0 until 3).flatMap { c =>
      (0 until nPer).map { i =>
        val base = Array.fill(8)(0.01f * ((c * nPer + i) % 7))
        base(c) = 1.0f
        ((c * nPer + i).toLong, base)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode: deterministic, codes in range, repartition-invariant") {
    val df = clustered(20)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 4)
    assert(model.m == 4 && model.subDim == 2)
    val a = Pq.encodeAll(df, "vec_id", "embedding", model)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val b = Pq.encodeAll(df.repartition(7), "vec_id", "embedding", model)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(a.toSeq == b.toSeq)
    assert(a.forall { case (_, codes) =>
      codes.length == 4 && codes.forall(c => c >= 0 && c < model.k) })
  }

  test("adcTopK + refine recovers each vector's own cluster") {
    val df = clustered(20)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 4)
    val q = df.where(col("vec_id").isin(0L, 20L, 40L))
    val out = Pq.adcTopK(q, df, "vec_id", "embedding", model, k = 5, refine = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // every retrieved neighbor lies in the query's own planted cluster
    assert(out.nonEmpty)
    out.foreach { case (qid, nid) =>
      assert(qid / 20 == nid / 20, s"query $qid got cross-cluster neighbor $nid")
    }
    // and top-5 is exactly 5 per query
    assert(out.groupBy(_._1).forall(_._2.length == 5))
  }

  test("refine=0 returns raw ADC ranks; refined result matches brute top-k here") {
    val df = clustered(15)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 4)
    val q = df.where(col("vec_id") === 0L)
    val raw = Pq.adcTopK(q, df, "vec_id", "embedding", model, k = 3, refine = 0)
      .collect()
    assert(raw.length == 3 && raw.forall(_.getDouble(3) <= 0.0)) // negated L2
    val refined = Pq.adcTopK(q, df, "vec_id", "embedding", model, k = 3, refine = 15)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brute = Ann.bruteTopK(q, df, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(refined.toSeq == brute.toSeq) // refine window covers the cluster
  }

  test("ivfPqTopK: cell-pruned scan still recovers planted clusters") {
    val df = clustered(20)
    val ivfM = graft.ops.Ivf.train(df, "vec_id", "embedding", k = 4, iters = 4)
    val pqM = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 4)
    val q = df.where(col("vec_id").isin(0L, 20L, 40L))
    val out = Pq.ivfPqTopK(q, df, "vec_id", "embedding", ivfM, pqM,
        k = 5, nProbe = 2, refine = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.groupBy(_._1).forall(_._2.length == 5))
    out.foreach { case (qid, nid) =>
      assert(qid / 20 == nid / 20, s"query $qid got cross-cluster neighbor $nid")
    }
  }

  test("guards: m must divide dim; refine must cover k; bounded queries") {
    val df = clustered(5)
    val e1 = intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "embedding", m = 3, k = 4)
    }
    assert(e1.getMessage.contains("divide"))
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 4, iters = 2)
    val e2 = intercept[IllegalArgumentException] {
      Pq.adcTopK(df, df, "vec_id", "embedding", model, k = 5, refine = 3)
    }
    assert(e2.getMessage.contains("refine"))
    val e3 = intercept[IllegalArgumentException] {
      Pq.adcTopK(df, df, "vec_id", "embedding", model, k = 2, maxQueries = 3)
    }
    assert(e3.getMessage.contains("maxQueries"))
  }
}

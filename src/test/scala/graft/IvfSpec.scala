package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.{Ann, Ivf}

/** IVF ANN: deterministic training, sane recall vs brute force, no
  * cartesian product. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables(spark, dir, "embeddings")

  test("training is deterministic and produces k centroids") {
    val m1 = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val m2 = Ivf.train(emb, "vec_id", "embedding", k = 16)
    assert(m1.k == 16)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("IVF top-k recall vs brute force with generous probes") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val queries = emb.where(col("vec_id") < 50)
    val brute = Ann.bruteTopK(queries, emb, "vec_id", "embedding", 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(queries, emb, "vec_id", "embedding", model, k = 3, nProbe = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("plan has no cartesian product") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8)
    val plan = Ivf.topK(emb, emb, "vec_id", "embedding", model, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("train clamps k to the sample size on tiny input and still answers") {
    val tiny = emb.limit(5)
    val model = Ivf.train(tiny, "vec_id", "embedding", k = 16)
    assert(model.centroids.length <= 5)
    val out = Ivf.topK(tiny, tiny, "vec_id", "embedding", model, k = 2,
      nProbe = model.centroids.length)
    assert(out.count() > 0)
  }
}

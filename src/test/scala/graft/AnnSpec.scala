package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.Ann

/** Similarity search: brute-force exactness, LSH recall, plan shape. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables(spark, dir, "embeddings")

  test("cosine of identical vectors is 1.0; orthogonal is 0.0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
    val out = df.select(round(Ann.cosine(col("a"), col("b")), 6)).as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("native cosine kernel is bit-identical to the higher-order formulation") {
    val emb2 = emb.limit(50)
    val a = emb2.select(col("vec_id").as("ai"), col("embedding").as("av"))
    val b = emb2.select(col("vec_id").as("bi"), col("embedding").as("bv"))
    val both = a.crossJoin(b).where(col("ai") < col("bi"))
      .select(Ann.cosine(col("av"), col("bv")).as("k"),
        Ann.cosineHof(col("av"), col("bv")).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0)
  }

  test("bruteTopK returns k neighbors per query, self excluded, rank ordered") {
    val out = Ann.bruteTopK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", 3)
      .orderBy("qid", "rank").collect()
    assert(out.length == 15)
    out.foreach { r =>
      assert(r.getAs[Long]("qid") != r.getAs[Long]("nid"))
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
    }
    // scores non-increasing within a query
    out.grouped(3).foreach { g =>
      val s = g.map(_.getAs[Double]("score"))
      assert(s.sameElements(s.sorted.reverse))
    }
  }

  test("LSH top-k recall vs brute force is high on the fixture") {
    val k = 3
    val queries = emb.where(col("vec_id") < 50)
    val brute = Ann.bruteTopK(queries, emb, "vec_id", "embedding", k)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(queries, emb, "vec_id", "embedding", k,
      tables = 16, bits = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("LSH path has no cartesian product and no broadcast of the big side") {
    val plan = Ann.lshTopK(emb, emb, "vec_id", "embedding", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embeddingNearDups finds planted duplicates") {
    val planted = emb.select(col("vec_id"), col("embedding"))
      .union(emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val pairs = Ann.embeddingNearDups(planted, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = emb.select("vec_id").collect().map(_.getLong(0))
      .map(i => (i, i + 10000)).toSet
    assert(expected.subsetOf(pairs))
  }

  test("quantizeInt8: hand-computed values, zero-vector safe, |q| <= 127") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.quantizeInt8(df).orderBy("vec_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(127L, -63L, 32L, 0L))
    assert(out.filter(_._1 == 2L).map(_._3).forall(_ == 0L))
    assert(math.abs(out.head._4 - 1.0 / 127.0) < 1e-15)
    assert(out.forall(r => math.abs(r._3) <= 127))
  }

  test("l2Normalize: unit norm on the fixture, zero vector passes through") {
    import spark.implicits._
    val norms = Ann.l2Normalize(emb)
      .groupBy("vec_id").agg(sum(col("v") * col("v")).as("n2"))
      .where(abs(col("n2") - 1.0) > 1e-4)
    assert(norms.count() == 0)
    val z = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Ann.l2Normalize(z).agg(sum(abs(col("v")))).first().getDouble(0) == 0.0)
  }

  test("quantizeInt8 dequant error is bounded by scale/2 on the fixture") {
    val orig = emb.select(col("vec_id"), posexplode(col("embedding").cast("array<double>")))
      .select(col("vec_id"), col("pos"), col("col").as("x"))
    val bad = Ann.quantizeInt8(emb).join(orig, Seq("vec_id", "pos"))
      .where(abs(col("q") * col("scale") - col("x")) > col("scale") / 2 + 1e-12)
    assert(bad.count() == 0)
  }

  test("randomProjection: hand-checked signs, deterministic across repartition") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = Ann.randomProjection(vecs, "vec_id", "embedding", r = 2)
      .orderBy("k").collect().map(r => (r.getInt(1), r.getLong(2)))
    // k=0: hash bit of (0,0) is 0 (+x0), of (0,1) is 1 (2654435761 has
    // bit 31 set) (−x1) → 1e6 − 2e6 = −1e6
    assert(out(0) == (0, -1000000L))
    // reference arithmetic for every (k,i)
    def sign(k: Long, i: Long): Long =
      if ((((k * 1000003L + i) * 2654435761L) % 4294967296L) >> 31 == 0) 1 else -1
    assert(out(1)._2 == sign(1, 0) * 1000000L + sign(1, 1) * 2000000L)

    val many = (0 until 50).map(i => (i.toLong, Array.fill(8)(i * 0.1f + 0.01f)))
      .toDF("vec_id", "embedding")
    val a = Ann.randomProjection(many, "vec_id", "embedding", 4)
      .orderBy("vec_id", "k").collect().map(_.toSeq)
    val b = Ann.randomProjection(many.repartition(7), "vec_id", "embedding", 4)
      .orderBy("vec_id", "k").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("hardNegatives: band membership exact, near-dups and easy negatives excluded") {
    import spark.implicits._
    // planted cosines against anchor (1,0): id 2 → 1.0 (dup, above band),
    // id 3 → cos 45° ≈ 0.7071 (above band), id 4 → cos 60° = 0.5
    // (EXCLUSIVE upper bound — excluded), id 5 → ≈ 0.3090 (in band),
    // id 6 → 0.0 (below band)
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val vecs = Seq(
      (1L, v(0)), (2L, v(0)), (3L, v(45)), (4L, v(60)), (5L, v(72)), (6L, v(90))
    ).toDF("vec_id", "embedding")
    val out = Ann.hardNegatives(vecs.where(col("vec_id") === 1L), vecs,
        "vec_id", "embedding", simLo = 0.2, simHi = 0.5, k = 5)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1, 5L, 0.309)))
    // LSH variant returns a SUBSET of the exact band (never invents)
    val exact = Ann.hardNegatives(vecs, vecs, "vec_id", "embedding", 0.2, 0.5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Ann.hardNegativesLsh(vecs, vecs, "vec_id", "embedding", 0.2, 0.5, 5,
        dims = 2).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("labelAgreement: planted mislabel is out-voted by its neighborhood") {
    import spark.implicits._
    // tight cluster of label 0 with one label-1 point planted inside it,
    // plus a genuinely isolated label-1 point
    val vecs = Seq(
      (1L, Array(1.00f, 0.00f), 0), (2L, Array(0.99f, 0.01f), 0),
      (3L, Array(0.98f, 0.02f), 0), (4L, Array(0.97f, 0.03f), 0),
      (5L, Array(0.96f, 0.04f), 1), // mislabeled: sits inside cluster 0
      (6L, Array(0.00f, 1.00f), 1)  // isolated
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.labelAgreement(vecs, vecs, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(5L) == (0L, true), "planted mislabel: zero agreeing neighbors")
    assert(out(6L)._2, "isolated point is a suspect too")
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(!out(id)._2, s"clean cluster member $id must not be flagged"))
  }

  test("labelAgreementLsh ≡ labelAgreement on the planted one-hot clusters") {
    // p119's fixture: identical vectors share every LSH bucket, so the
    // bucketed candidate set contains the full exact neighborhood —
    // row-for-row equality proves the brute→LSH swap only changes the
    // neighbor SOURCE, never the voting arithmetic
    val base = spark.range(200).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> CASE WHEN i = CAST(id div 20 AS INT) " +
        "THEN CAST(1.0 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END)").as("embedding"),
      expr("CASE WHEN id % 20 = 0 THEN (id div 20 + 1) % 10 ELSE id div 20 END")
        .as("label"))
    val brute = Ann.labelAgreement(base, base, "vec_id", "embedding", "label", k = 5)
    val lsh = Ann.labelAgreementLsh(base, base, "vec_id", "embedding", "label", k = 5)
    assert(brute.exceptAll(lsh).isEmpty && lsh.exceptAll(brute).isEmpty)
    // and the vote itself lands where planted: exactly the 10 first-of-
    // cluster mislabels are suspects
    val suspects = lsh.where(col("suspect")).select("qid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(suspects == (0L until 200L by 20L).toSeq)
  }
}

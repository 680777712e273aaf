package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clustering

/** Deterministic fixed-point k-means: hand-planted clusters, empty-cluster
  * centroid retention, reshuffle stability. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two planted clusters separate after one iteration from co-located seeds") {
    // seeds are ids 1 and 2 — both in the left blob; the right blob must
    // still pull centroid 1 over by the mean update
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.0f, 0.1f)),
      (4L, Array(10.0f, 10.0f)), (5L, Array(10.1f, 10.0f)), (6L, Array(10.0f, 10.1f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(4L), out(5L), out(6L)).size == 1)
    assert(out(1L) != out(4L))
  }

  test("duplicate seeds: the starved cluster keeps its centroid, run stays total") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    // seeds = ids 1,2 (identical): every point ties to cid 0 first, so
    // cluster 1 is empty each round and must survive with its seed centroid
    val out = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(1)).forall(c => c == 0 || c == 1))
  }

  test("assignment and dist2 are exact and reshuffle-stable") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)),
      (3L, Array(-1.0f, 0.5f)), (4L, Array(2.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val a = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = Clustering.kmeans(vecs.repartition(5), "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
    // dist2 of a point equal to an integral centroid is exactly 0
    val exact = Clustering.kmeans(vecs.limit(2), "vec_id", "embedding", k = 2, iters = 1)
      .orderBy("vec_id").collect()
    assert(exact.forall(_.getLong(2) == 0L))
  }

  test("semDeDup prunes the within-cluster near-copy, keeps cross-cluster and sub-threshold rows") {
    // two well-separated blobs; id 2 is a scaled copy of id 1 (cosine 1),
    // id 3 is orthogonal-ish in the same blob region but below tau once
    // clustered with 1 and 2; ids 10/11 form the other cluster, dissimilar
    // to each other (cosine 0 — both kept)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),  // scaled copy of 1 -> pruned, dup_of 1
      (10L, Array(0.0f, 50.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 50.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.semDeDup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.9)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out(1L) == (true, -1L))
    assert(out(2L) == (false, 1L)) // pruned back to the smallest-id twin
    assert(out(10L)._1 && out(11L)._1) // same cluster, cosine 0 < tau
    assert(out.size == 4)
  }

  test("semDeDup transitive set keeps exactly the smallest id") {
    val vecs = Seq(
      (5L, Array(1.0f, 1.0f)), (6L, Array(2.0f, 2.0f)), (7L, Array(3.0f, 3.0f)),
      (8L, Array(-4.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.semDeDup(vecs, "vec_id", "embedding",
        k = 2, iters = 1, tau = 0.9)
      .orderBy("vec_id").collect()
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept.contains(5L) && !kept.contains(6L) && !kept.contains(7L))
    out.filter(!_.getBoolean(2)).foreach(r => assert(r.getLong(3) == 5L))
  }

  test("clusterQuotaSample: quota per cluster, centroid-proximal first") {
    // two tight planted clusters around (0,0) and (100,100); quota 2
    // must take the 2 CLOSEST members of each, ranked by exact dist2
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 2.0f)),
      (4L, Array(3.0f, 0.0f)),
      (10L, Array(100.0f, 100.0f)), (11L, Array(101.0f, 100.0f)),
      (12L, Array(100.0f, 103.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.clusterQuotaSample(vecs, "vec_id", "embedding",
        k = 2, iters = 2, quota = 2)
      .orderBy("cluster", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    assert(out.length == 4)
    val byCluster = out.grouped(2).toSeq
    // each cluster contributes exactly rk 1, 2; the far members (4, 12)
    // are cut; which planted group gets which cluster id is seed-defined
    assert(byCluster.forall(g => g.map(_._2).toSeq == Seq(1, 2)))
    val chosen = out.map(_._1).toSet
    assert(!chosen.contains(4L) && !chosen.contains(12L))
  }

  test("clusterQuotaSample is reshuffle-stable (no RNG anywhere)") {
    val base = graft.engine.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Clustering.clusterQuotaSample(base, "vec_id", "embedding", k = 3, iters = 2, quota = 10)
      .orderBy("cluster", "rk").collect().map(_.toSeq).toSeq
    val b = Clustering.clusterQuotaSample(base.repartition(7), "vec_id", "embedding", k = 3, iters = 2, quota = 10)
      .orderBy("cluster", "rk").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("clusterQuality: hand-replayed silhouette and DB ratio on a 1-D pair of blobs") {
    // seeds 0 and 200000 micro; after 2 Lloyd rounds centroids land at
    // 100000 and 10100000 exactly (floor(sum/n) replayed by hand)
    val vecs = Seq(
      (1L, Array(0.0f)), (2L, Array(0.2f)),
      (3L, Array(10.0f)), (4L, Array(10.2f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.clusterQuality(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // float32 0.2f/10.2f quantize to 200000/10199999 micro; the replay
    // gives centroids 100000 and 10099999, per-point s ∈ {990099,
    // 989898, 989899}, means 989998/989999, S 100000/99999 micro,
    // M = 9999999 → R = 199999·1e6 div M = 19999
    assert(out.toSeq == Seq(
      (0, 2L, 989998L, 100000L, 19999L),
      (1, 2L, 989999L, 99999L, 19999L)))
  }

  test("labelSeparation: hand-computed 1-D pair, scatter and ratio exact") {
    val vecs = Seq(
      (1L, Array(0.0f), 0L), (2L, Array(0.2f), 0L),
      (3L, Array(10.0f), 1L), (4L, Array(10.2f), 1L)
    ).toDF("vec_id", "embedding", "label")
    val r = Clustering.labelSeparation(vecs, "vec_id", "embedding", "label")
      .collect()(0)
    // float32 10.2f → 10199999 micro: centroid 10099999, S_1 = 99999;
    // class 0: centroid 100000, S_0 = 100000; M = 9999999
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((0L, 1L, 2L, 2L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((9999999L, 100000L, 99999L)))
    assert(r.getLong(7) == 50000245L)
  }

  test("clusterQuality: point sitting on its centroid scores silhouette 1e6") {
    val vecs = Seq(
      (1L, Array(0.0f)), (2L, Array(4.0f))
    ).toDF("vec_id", "embedding")
    // singletons: each point IS its centroid → a = 0, b > 0 → s = 1e6
    val out = Clustering.clusterQuality(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0, 1000000L, 0L), (1, 1000000L, 0L)))
  }
}

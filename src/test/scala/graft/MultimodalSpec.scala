package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.Multimodal

/** Multimodal plumbing: schema, batched decode, resample, frame sampling.
  * The decode itself is a documented deterministic stub; everything
  * around it (typed Dataset, mapPartitions batching, explode shape) is
  * the real scale path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.mediaFromDocuments(
    spark, Tables(spark, "/root/testdata/sf0.001", "documents"))

  test("media table has the three kinds and binary payloads") {
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("feature extraction is deterministic, 16-dim, normalized") {
    val f1 = Multimodal.extractFeatures(media).filter(_.media_id == 0).head()
    val f2 = Multimodal.extractFeatures(media).filter(_.media_id == 0).head()
    assert(f1.features.toSeq == f2.features.toSeq)
    assert(f1.features.length == 16)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-3)
    assert(f1.n_bytes > 0 && f1.checksum != 0L)
  }

  test("resample shrinks payload by the factor") {
    val before = media.filter(_.media_id == 0).head().bytes.length
    val after = Multimodal.resample(media, 4).filter(_.media_id == 0).head().bytes.length
    assert(after == (before + 3) / 4)
  }

  test("frame sampling explodes video rows into stride-spaced frames") {
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 2)
    val one = frames.filter("media_id = 2").collect() // doc 2 → kind video
    assert(one.nonEmpty)
    assert(one.map(_.getInt(1)).forall(_ % 2 == 0))
  }
}

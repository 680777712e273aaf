package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Throwaway measurement harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsPath = ScaleData.materialize(spark, "/root/testdata/sf0.1", "documents", 20, 32)
    val docs = spark.read.parquet(docsPath)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val slim = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    time("tokenCount only")(sink(slim))
    time("pack as-called")(sink(graft.ops.Packing.packSequences(
      slim, "doc_id", "n_tokens", 2048, 128)))
    val p = slim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist slim")(p.count(): Unit)
    time("pack persisted input")(sink(graft.ops.Packing.packSequences(
      p, "doc_id", "n_tokens", 2048, 128)))
    time("text_profile")(sink(TextAnalysis.profile(docs)))
    spark.stop()
  }
}

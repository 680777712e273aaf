package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Throwaway measurement harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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

    (1 to 3).foreach { i =>
      time(s"repeated_spans#$i") { sink(Dedup.repeatedSpans(docs, n = 20)) }
      time(s"apply_span_cuts#$i") { sink(Dedup.applySpanCuts(docs,
        Dedup.repeatedSpans(docs, n = 20))) }
    }
    spark.stop()
  }
}

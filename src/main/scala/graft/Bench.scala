package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the env-selected
  * scale factor and prints ONE JSON line. Full evaluation is forced with
  * the `noop` datasource (every column materialized — a `.count()` would
  * let Catalyst prune the projection and time a near-empty scan). Failed
  * queries are reported as value -1, never as a fake timing.
  *
  * Reports the per-query MEDIAN of ≥3 iterations (SPARK_GRAFT_BENCH_ITERS
  * to override): a single shared local[32] JVM shows 10–20× per-query
  * swings from GC/compilation interference, and min-of-2 let one lucky or
  * unlucky run decide the round-over-round comparison. */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (SparkEntry.queries.isEmpty) {
      System.err.println("[bench] FATAL: SparkEntry.queries is empty — nothing to measure")
      spark.stop()
      sys.exit(1)
    }

    // session warmup: run the flagship once so JVM/codegen/scheduler
    // warmup is not charged to whichever query happens to run first
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    var failed = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iterations).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      if (times.isEmpty) failed += 1
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    // Scaled tier: the ~10 headline data-shaped operators at ×SCALE docs
    // / ×(SCALE/2) events (defaults 20/10, matching SCALING.md's study) —
    // the sf0.1 suite is plan-overhead-dominated (median query ~0.4 s),
    // so THIS is the signal that catches a real plan regression.
    // SPARK_GRAFT_BENCH_SCALE=0 disables.
    val scale = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "20").toInt
    val scaledJson = if (scale <= 1) "" else {
      try {
        val evScale = math.max(scale / 2, 1)
        val docsPath = graft.tools.ScaleData.materialize(spark, sfDir, "documents", scale, cpus.toInt)
        val eventsPath = graft.tools.ScaleData.materialize(spark, sfDir, "events", evScale, cpus.toInt)
        val ops = graft.tools.ScaledOps.run(spark, docsPath, eventsPath)
        failed += ops.count(_._2 < 0)
        val opsJson = ops.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        s""","scaled":{"docs_x":$scale,"events_x":$evScale,"ops":$opsJson}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] scaled tier failed: ${e.getMessage}")
          failed += 1
          ""
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"iterations":$iterations,"sf":"$sfDir"$scaledJson}""")
    spark.stop()
    if (failed > 0) sys.exit(2)
  }
}

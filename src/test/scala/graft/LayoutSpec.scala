package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order layout: exact interleave arithmetic, locality, and the
  * range-partitioned physical shape. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaveBits: hand-computed Morton codes") {
    // a=0b101, b=0b011 → z = a1b1 a0b0 interleaved from bit 2 down:
    // bits of a at odd positions (5,3,1), b at even (4,2,0):
    // a=101 → 1<<5 | 0<<3 | 1<<1 = 34; b=011 → 0<<4 | 1<<2 | 1<<0 = 5; z=39
    val df = Seq((5L, 3L)).toDF("a", "b")
    val z = df.select(Layout.interleaveBits(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(z == 39L)
    // corners: (0,0) → 0; (2^4-1, 2^4-1) → 2^8-1
    val corners = Seq((0L, 0L), (15L, 15L)).toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0))
    assert(corners.toSeq == Seq(0L, 255L))
  }

  test("z-order locality beats single-column sort for the off-axis dimension") {
    // grid of points: after z-clustering into 4 ranges, each range's
    // b-extent must be far below the full domain (a b-filter prunes),
    // which a pure a-sort cannot achieve (every a-run spans all of b)
    val pts = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong * 32 + b, a.toLong, b.toLong))
      .toDF("id", "a", "b")
    val keyed = Layout.zOrderKey(pts, "id", "a", "b", bits = 5)
      .join(pts, Seq("id"))
    val ranges = keyed.withColumn("bucket", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("zv")))
      .groupBy("bucket").agg((max("b") - min("b")).as("b_span"), (max("a") - min("a")).as("a_span"))
      .collect()
    // each z-bucket covers about half the b-domain (two quadrant rows),
    // never the whole of it — single-column a-sort buckets span all 32
    assert(ranges.forall(_.getAs[Long]("b_span") <= 16), ranges.mkString(","))
  }

  test("clusterByZ plans a range partition + in-partition sort on zv") {
    val pts = (0 until 64).map(i => (i.toLong, i.toLong % 8, i.toLong / 8))
      .toDF("id", "a", "b")
    val p = Layout.clusterByZ(pts, "id", "a", "b", parts = 4, bits = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning(zv"), p)
    assert(p.contains("Sort [zv"), p)
  }

  test("writeDatePartitioned: date-filtered reads prune to the matching directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dtpart").toString
    val ev = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          (i % 3) * 86400000L + i * 1000L), i * 1.0)
    }.toDF("event_id", "ts", "value")
    Layout.writeDatePartitioned(ev, dir)
    // three date directories exist
    val dts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).sorted
    assert(dts.toSeq == Seq("dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"))
    val read = spark.read.parquet(dir)
      .where(org.apache.spark.sql.functions.col("dt") === "2024-01-02")
    // the partition filter prunes directories — it is a PartitionFilter,
    // never a data filter, and only one of three partitions survives
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    assert(read.count() == 100L)
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.headOption.contains(1), s"expected 1 pruned partition, got $scanned")
    // small-files guard: the repartition keeps it to ONE file per date
    dts.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files")
    }
  }

  test("compact: many small files fold to the byte-sized target, rows intact") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    (1L to 1000L).toDF("id").repartition(20).write.mode("overwrite").parquet(in)
    val (before, after, bytes) = graft.ops.Layout.compact(
      spark, in, out, targetBytes = 1L << 30)
    assert(before == 20L && after == 1L && bytes > 0L)
    assert(spark.read.parquet(out).count() == 1000L)
    // sizing follows the on-disk bytes: a tiny target forces a split
    val out2 = java.nio.file.Files.createTempDirectory("compact_out2").toString
    val (_, after2, _) = graft.ops.Layout.compact(
      spark, in, out2, targetBytes = math.max(1L, bytes / 4))
    assert(after2 >= 4L, s"expected >= 4 files, got $after2")
    assert(spark.read.parquet(out2).count() == 1000L)
    // in-place compaction would delete the source mid-plan — refused
    val e = intercept[IllegalArgumentException] {
      graft.ops.Layout.compact(spark, in, in)
    }
    assert(e.getMessage.contains("must differ"))
    assert(spark.read.parquet(in).count() == 1000L) // source untouched
    // ALIASED in-place spellings must be refused too: raw Path equality
    // passes 'file:/x' vs '/x' and relative vs absolute, and the
    // overwrite would still delete the source (qualified-path guard)
    for (alias <- Seq(s"file:$in", in + "/../" + new java.io.File(in).getName)) {
      val ea = intercept[IllegalArgumentException] {
        graft.ops.Layout.compact(spark, in, alias)
      }
      assert(ea.getMessage.contains("must differ"), s"alias not caught: $alias")
    }
    assert(spark.read.parquet(in).count() == 1000L) // still untouched
  }

  test("schema evolution: mergeSchema unions old and new file schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "batch"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // the pre-evolution file reads with NULL in the new column
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }
}

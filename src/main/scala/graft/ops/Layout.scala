package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for
  * multi-dimensional file pruning. Sorting/range-partitioning a table
  * by the interleaved key co-locates rows that are close in BOTH
  * dimensions, so min/max file statistics prune scans filtered on
  * either column — the standard lakehouse layout optimization for
  * "filter on a OR on b" workloads that a single-column sort can't
  * serve.
  *
  * The z-value is pure integer arithmetic (per-dimension equal-width
  * bucketing to 2^bits ranks — the histogram formula — then bit
  * interleaving with literal shifts), bit-identical on any engine. */
object Layout {

  /** Interleave the low `bits` of a (odd positions) and b (even):
    * a folded chain of shift/mask terms, fully codegen'd. Inputs must
    * already be bucket ranks in [0, 2^bits). */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "interleaveBits: 1..31 bits per dimension")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Equal-width rank of `v` in [lo, hi] to [0, 2^bits): the histogram
    * bucket formula — IEEE double arithmetic over exact bounds, then
    * clamped into range. */
  private def rank(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1L << bits
    if (hi == lo) lit(0L)
    else {
      val width = (hi - lo) / buckets
      least(floor((v.cast("double") - lit(lo)) / lit(width)).cast("long"), lit(buckets - 1))
    }
  }

  /** (idCol, zv): the Z-order key for every row over two numeric
    * columns, `bits` bucket bits per dimension. One scalar min/max
    * pass, then map-only. */
  def zOrderKey(
      df: DataFrame,
      idCol: String,
      colA: String,
      colB: String,
      bits: Int = 16): DataFrame = {
    val a = col(colA).cast("double")
    val b = col(colB).cast("double")
    val r = df.agg(min(a), max(a), min(b), max(b)).first()
    require(!r.isNullAt(0), "zOrderKey: empty input or all-NULL dimensions")
    df.select(col(idCol),
      interleaveBits(
        rank(a, r.getDouble(0), r.getDouble(1), bits),
        rank(b, r.getDouble(2), r.getDouble(3), bits),
        bits).as("zv"))
  }

  /** Re-layout `df` clustered by the Z-curve over (colA, colB): range
    * partition + in-partition sort on the z-key, ready for a writer
    * whose per-file min/max stats then prune on EITHER column. */
  def clusterByZ(
      df: DataFrame,
      idCol: String,
      colA: String,
      colB: String,
      parts: Int,
      bits: Int = 16): DataFrame = {
    val keyed = df.join(zOrderKey(df, idCol, colA, colB, bits), Seq(idCol))
    keyed.repartitionByRange(parts, col("zv")).sortWithinPartitions("zv")
  }

  /** HIVE-PARTITIONED parquet write by a derived UTC date column — the
    * single most load-bearing 100 TB layout decision: a date-filtered
    * scan then reads ONLY the matching directories (plan shows
    * `PartitionFilters`, and the filter never touches row data). One
    * `repartition` on the partition column before the write keeps it to
    * one file per date per shuffle partition instead of
    * #tasks × #dates tiny files — the small-files failure mode that
    * kills listing-time at scale.
    *
    * The date string is `date_format(ts, 'yyyy-MM-dd')` under the
    * session's UTC timezone (GraftSession pins it), so layout is
    * reproducible across writers. Readers get the pruning for free:
    * `spark.read.parquet(path).where(col("dt") === "2024-01-02")` —
    * LayoutSpec pins the pruned-scan plan shape. */
  def writeDatePartitioned(
      df: DataFrame,
      path: String,
      tsCol: String = "ts",
      dateCol: String = "dt"): Unit =
    df.withColumn(dateCol, date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col(dateCol))
      .write.mode("overwrite")
      .partitionBy(dateCol)
      .parquet(path)

  /** SMALL-FILE COMPACTION — rewrite a parquet directory into
    * ⌈bytes / targetBytes⌉ files: the maintenance job every streaming
    * or per-batch writer eventually owes the table (ten thousand 100 KB
    * files cost more in listing + task scheduling than the data costs
    * to read; a 100 TB table's NameNode/manifest health depends on
    * this running). Sizing comes from the CURRENT on-disk bytes — the
    * compressed truth, not a row-count heuristic.
    *
    * One `repartition(n)` round-robin exchange — no key skew possible
    * by construction. Writes to `outPath` (side-by-side then swap is
    * the caller's atomicity policy; compacting in place would lose the
    * table on a mid-write failure). Returns (files_before,
    * files_after, bytes_before). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Long, Long) = {
    require(targetBytes > 0, s"compact: need targetBytes > 0, got $targetBytes")
    // mode("overwrite") deletes outPath before the lazy read of inPath
    // completes — compacting in place would destroy the table, so the
    // scaladoc's warning is enforced, not advisory. Compare FULLY
    // QUALIFIED paths: raw Path equality passes aliases like
    // 'file:/data/t' vs '/data/t' or './t' vs its absolute form, and
    // the overwrite would still delete the source.
    val conf = spark.sparkContext.hadoopConfiguration
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fs = inP.getFileSystem(conf)
    val inQ = fs.makeQualified(inP)
    val outQ = outP.getFileSystem(conf).makeQualified(outP)
    require(inQ != outQ,
      s"compact: outPath must differ from inPath (in-place compaction " +
        s"loses the table), got $inQ vs $outQ")
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(inPath)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (before.size.toLong, parquetFiles(outPath).size.toLong, bytes)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.UrlOps

/** INCREMENTAL CRAWL-FRONTIER maintenance — the streaming closure of
  * the batch crawl loop (p344): fetch results arrive as a stream of
  * (url, html) pages, each micro-batch extracts their links
  * ([[graft.ops.LinkOps.extractLinks]], spec-pinned batch-agnostic),
  * folds the new in-link counts into a persistent counts store, and
  * re-derives the politeness-ranked frontier snapshot. A real
  * crawler's frontier is a living structure — this is the composition
  * that keeps it alive under Structured Streaming's restart semantics.
  *
  * Scale shape per micro-batch: link extraction is map-only over the
  * BATCH; the fold is one aggregate-merge against the counts store —
  * O(|distinct targets|), NOT O(all links ever seen) (an
  * append-a-link-log-and-rescan design re-reads unbounded history per
  * batch; the counts store is the bounded-state form, the same
  * reasoning as watermarked agg state). The crawled set is
  * append-only distinct URLs.
  *
  * EXACTLY-ONCE fold: foreachBatch may re-deliver a batch after a
  * checkpoint-restart kill. Each fold writes counts generation
  * `counts_b<id>` from its committed predecessor and marks it with a
  * `_committed` file as the LAST step — a re-delivered batch either
  * sees the marker (skip, already folded) or recomputes the whole
  * generation deterministically from the predecessor, so in-link
  * counts never double no matter where the previous attempt died
  * (spec-pinned across a kill+restart). A production deployment gets
  * the same effect from a transactional table format.
  *
  * DISK is bounded too, not just compute: after each commit the fold
  * prunes committed generations older than the predecessor (keeping
  * two — current + the re-delivery window), so a long-running crawl
  * holds at most two counts snapshots at any time (spec-pinned). */
object CrawlStream {

  private def committedGens(stateDir: String): Seq[Long] = {
    val d = new java.io.File(stateDir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
    fs.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("counts_b") &&
        new java.io.File(f, "_committed").exists())
      .map(_.getName.stripPrefix("counts_b").toLong)
      .sorted
  }

  /** Fold ONE batch of fetched pages into the frontier state and
    * rewrite `<stateDir>/frontier`. Exposed for direct testing — the
    * streaming query calls exactly this per micro-batch.
    *
    * The frontier derivation is INCREMENTAL: a batch can only change
    * the frontier of hosts it touched (hosts of its extracted link
    * targets — their counts moved — and hosts of its fetched pages —
    * their rows may leave). Those hosts re-rank from the counts store
    * through a pushed `host IN (...)` scan filter; every other host's
    * rows are reused from the previous snapshot verbatim. A long
    * crawl's per-batch cost is then O(batch's hosts' rows), not
    * O(counts store) — the full re-rank of early rounds was
    * quadratic-ish over the crawl's lifetime. */
  def foldBatch(
      batch: DataFrame,
      batchId: Long,
      stateDir: String,
      maxPerHost: Int,
      delays: Option[DataFrame],
      agent: String): Unit = {
    val s = batch.sparkSession
    val gens = committedGens(stateDir)
    if (!gens.contains(batchId)) {
      val prev = gens.filter(_ < batchId).lastOption
      // the stream contract is (url, html); extractLinks wants a page
      // id — the URL hash serves (collisions only mislabel link_pos
      // provenance, which the counts fold never reads)
      val newCounts = graft.ops.LinkOps
        .extractLinks(batch.withColumn("doc_id", xxhash64(col("url"))))
        .groupBy(col("dst_url")).agg(count(lit(1)).as("n_inlinks"))
        .withColumn("host", lower(parse_url(col("dst_url"), lit("HOST"))))
      val merged = prev match {
        case None => newCounts
        case Some(p) => s.read.parquet(s"$stateDir/counts_b$p")
          .unionByName(newCounts)
          .groupBy("dst_url", "host").agg(sum(col("n_inlinks")).as("n_inlinks"))
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/counts_b$batchId")
      // crawled set: append-only; duplicates are harmless (distincted
      // below), so re-delivery needs no marker of its own
      batch.select(graft.functions.UrlFunctions.url_normalize(col("url"))
        .as("url")).distinct()
        .write.mode("append").parquet(s"$stateDir/crawled")
      // the commit point: everything above is deterministic from the
      // predecessor, so a crash anywhere before this line makes the
      // re-delivered batch recompute, never double-count
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$stateDir/counts_b$batchId", "_committed"))
      // prune: keep the two NEWEST committed generations (current +
      // predecessor — the re-delivery window needs the predecessor to
      // recompute a crashed successor) and delete the rest. Without
      // this a long-running crawl accumulates one full cumulative
      // counts snapshot PER MICRO-BATCH: compute was bounded, disk
      // was not. Delete is post-commit, so a crash mid-prune only
      // leaves extra generations — never removes a needed one.
      committedGens(stateDir).dropRight(2).foreach { g =>
        deleteDir(new java.io.File(s"$stateDir/counts_b$g"))
      }
    }
    val cur = committedGens(stateDir).last
    val counts = s.read.parquet(s"$stateDir/counts_b$cur")
    val crawled = s.read.parquet(s"$stateDir/crawled")

    // hosts this batch touched: its link targets (counts moved) and
    // its fetched pages (rows may leave the frontier). Batch-bounded,
    // so the collect is a micro-batch's host set — never corpus-sized
    // — and the literal IN list is what pushes into the counts scan.
    val touched: Array[String] = graft.ops.LinkOps
      .extractLinks(batch.withColumn("doc_id", xxhash64(col("url"))))
      .select(lower(parse_url(col("dst_url"), lit("HOST"))).as("host"))
      .unionByName(batch.select(lower(parse_url(
        graft.functions.UrlFunctions.url_normalize(col("url")),
        lit("HOST"))).as("host")))
      .where(col("host").isNotNull).distinct()
      .collect().map(_.getString(0))

    val prevSnap = new java.io.File(s"$stateDir/frontier")
    val incremental = prevSnap.exists() && touched.nonEmpty
    // a missing snapshot (first batch, or a crash between swap steps)
    // falls back to the full re-rank — the incremental form is an
    // optimization, never load-bearing for correctness
    val scoped =
      if (incremental) counts.where(col("host").isin(touched.toSeq: _*))
      else counts
    val fresh = scoped.join(
      crawled.select(col("url").as("dst_url")).distinct().hint("SHUFFLE_HASH"),
      Seq("dst_url"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("n_inlinks").desc, col("dst_url"))
    val frontier = fresh
      .select(col("dst_url"), col("host"), col("n_inlinks"))
      .withColumn("host_rank", row_number().over(w))
      .where(col("host_rank") <= maxPerHost)
    val ranked = delays match {
      case Some(d) =>
        UrlOps.politenessSchedule(frontier, d, agent,
          urlCol = "dst_url", idCol = "dst_url", smallDim = Some(true))
      case None => frontier
    }
    // politeness is per-host (dense fetch_seq from 0 within each
    // host), so splicing re-ranked touched hosts beside reused
    // untouched rows is exactly the full re-rank's answer
    val snapshot =
      if (incremental)
        s.read.parquet(s"$stateDir/frontier")
          .where(!col("host").isin(touched.toSeq: _*))
          .unionByName(ranked)
      else ranked
    // the previous snapshot feeds the new plan, so write to a side
    // directory and swap — never overwrite what is being read
    val tmp = s"$stateDir/frontier_next"
    snapshot.write.mode("overwrite").parquet(tmp)
    deleteDir(prevSnap)
    if (!new java.io.File(tmp).renameTo(prevSnap))
      throw new java.io.IOException(s"frontier swap failed: $tmp")
  }

  private def deleteDir(d: java.io.File): Unit = {
    Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    d.delete()
  }

  /** Start the frontier-maintenance query over a STREAMING pages frame
    * ((url, html) columns). AvailableNow trigger: drains what is
    * staged, then stops — the file-source smoke shape; a live crawler
    * runs the same writer with a processing-time trigger. */
  def frontierStream(
      pages: DataFrame,
      stateDir: String,
      checkpoint: String,
      maxPerHost: Int = 1000,
      delays: Option[DataFrame] = None,
      agent: String = "graftbot"): StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, id, stateDir, maxPerHost, delays, agent)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CrawlStream

/** The streaming frontier (round-15 "what's missing" #3): fetch results
  * as a FILE stream updating a live frontier — per-batch fold into a
  * bounded counts store, politeness re-ranking, and the restart
  * semantics a crawler needs: streaming end-state ≡ one batch run,
  * in-link counts survive a kill+restart without doubling, re-delivered
  * batches are idempotent, per-host caps hold on every snapshot. */
class CrawlStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()

  /** p344-shaped fetch results: page d links to target group d/2 on
    * host t(d/2 % 3); every fifth target is itself already fetched. */
  private def pages(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
      .select(col("doc_id"),
        concat(lit("http://src"), col("doc_id") % 4, lit(".example/p/"),
          col("doc_id")).as("url"),
        concat(lit("<html><body><a href=\"http://t"),
          expr("doc_id div 2") % 3, lit(".example/page/"),
          expr("doc_id div 2"), lit("\">next</a></body></html>")).as("html"))
      .select("url", "html")
  }

  private def batchReference(ids: Seq[Long], maxPerHost: Int): Set[(String, String, Long, Int)] = {
    import spark.implicits._
    val p = pages(ids)
    val links = graft.ops.LinkOps.extractLinks(
      p.withColumn("doc_id", xxhash64(col("url"))))
    val crawled = p.select(
      graft.functions.UrlFunctions.url_normalize(col("url")).as("url"))
    graft.ops.LinkOps.frontierDiscover(links, crawled, maxPerHost = maxPerHost)
      .select("dst_url", "host", "n_inlinks", "host_rank")
      .as[(String, String, Long, Int)].collect().toSet
  }

  private def snapshot(stateDir: String): Set[(String, String, Long, Int)] = {
    import spark.implicits._
    spark.read.parquet(s"$stateDir/frontier")
      .select("dst_url", "host", "n_inlinks", "host_rank")
      .as[(String, String, Long, Int)].collect().toSet
  }

  test("streaming frontier end-state equals the batch loop across a kill+restart") {
    val stage = java.nio.file.Files.createTempDirectory("crawl_stage").toString
    val state = java.nio.file.Files.createTempDirectory("crawl_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_ckpt").toString
    val all = (0L until 60L).toSeq
    val half1 = all.filter(_ % 2 == 0)
    val half2 = all.filter(_ % 2 == 1)
    val schema = pages(all).schema

    def run(): Unit = drain(CrawlStream.frontierStream(
      spark.readStream.schema(schema).parquet(stage), state, ckpt,
      maxPerHost = 1000))

    pages(half1).write.mode("append").parquet(stage)
    run() // drains half1, then the query stops (simulated kill)
    val snap1 = snapshot(state)
    assert(snap1.nonEmpty)
    assert(snap1 == batchReference(half1, 1000),
      "after half1 the stream must equal the batch loop over half1")

    pages(half2).write.mode("append").parquet(stage)
    run() // fresh query, same checkpoint → resumes after half1
    val snap2 = snapshot(state)
    assert(snap2 == batchReference(all, 1000),
      "end state after restart must equal one batch run over everything")

    // in-link mass is monotone for every target surviving both
    // snapshots (targets leave only by being fetched, and counts only
    // accumulate — a doubled fold would break the batch equality above)
    val m1 = snap1.map(r => r._1 -> r._3).toMap
    val m2 = snap2.map(r => r._1 -> r._3).toMap
    for ((dst, n1) <- m1; n2 <- m2.get(dst))
      assert(n2 >= n1, s"$dst shrank: $n1 -> $n2")
  }

  test("re-delivered batches are idempotent: same batchId folds once") {
    val state = java.nio.file.Files.createTempDirectory("crawl_redeliver").toString
    val p = pages(0L until 20L)
    CrawlStream.foldBatch(p, 0L, state, 1000, None, "graftbot")
    val first = snapshot(state)
    // simulate foreachBatch re-delivery after a crash: same id, same rows
    CrawlStream.foldBatch(p, 0L, state, 1000, None, "graftbot")
    assert(snapshot(state) == first, "re-delivery doubled the counts")
    // a genuinely new batch still folds
    CrawlStream.foldBatch(pages(20L until 40L), 1L, state, 1000, None, "graftbot")
    assert(snapshot(state) != first)
  }

  test("incremental re-rank equals the full re-rank on a multi-batch run") {
    import spark.implicits._
    // multi-batch incremental run: batches share some hosts (doc_id/2
    // cycles 3 target hosts) and introduce disjoint targets, so every
    // batch touches a strict subset of hosts once counts accumulate
    val state = java.nio.file.Files.createTempDirectory("crawl_incr").toString
    for (b <- 0 until 4)
      CrawlStream.foldBatch(pages(b * 15L until (b + 1) * 15L), b.toLong,
        state, 1000, None, "graftbot")
    // reference: ONE batch over everything = the full re-rank answer
    assert(snapshot(state) == batchReference(0L until 60L, 1000),
      "incremental multi-batch end state diverged from the full re-rank")
    // and with a per-host cap + politeness, same equality
    val state2 = java.nio.file.Files.createTempDirectory("crawl_incr2").toString
    val delays = Seq(("t0.example", "*", 2000L), ("t1.example", "*", 1000L),
      ("t2.example", "*", 1000L)).toDF("host", "agent", "delay_ms")
    for (b <- 0 until 4)
      CrawlStream.foldBatch(pages(b * 15L until (b + 1) * 15L), b.toLong,
        state2, 3, Some(delays), "graftbot")
    val oneShot = java.nio.file.Files.createTempDirectory("crawl_incr3").toString
    CrawlStream.foldBatch(pages(0L until 60L), 0L, oneShot, 3,
      Some(delays), "graftbot")
    def full(dir: String): Set[(String, Int, Long)] =
      spark.read.parquet(s"$dir/frontier")
        .select("dst_url", "fetch_seq", "fetch_offset_ms")
        .as[(String, Int, Long)].collect().toSet
    assert(full(state2) == full(oneShot),
      "incremental politeness schedule diverged from the one-shot run")
  }

  test("the incremental counts scan is host-pruned: IN filter pushed to parquet") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("crawl_push").toString
    CrawlStream.foldBatch(pages(0L until 30L), 0L, state, 1000, None, "graftbot")
    // the mechanism foldBatch uses for touched hosts: a literal isin
    // over the host column must reach the scan as a pushed filter —
    // otherwise every batch reads the whole counts store again
    val counts = spark.read.parquet(s"$state/counts_b0")
      .where(org.apache.spark.sql.functions.col("host")
        .isin("t0.example", "t1.example"))
    val plan = counts.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(host"),
      s"host IN not pushed:\n$plan")
  }

  test("committed generations prune: at most 2 counts snapshots on disk") {
    val state = java.nio.file.Files.createTempDirectory("crawl_prune").toString
    for (b <- 0 until 5)
      CrawlStream.foldBatch(pages(b * 10L until (b + 1) * 10L), b.toLong,
        state, 1000, None, "graftbot")
    def gens(): Seq[String] =
      Option(new java.io.File(state).listFiles()).getOrElse(Array.empty)
        .toSeq.map(_.getName).filter(_.startsWith("counts_b")).sorted
    assert(gens() == Seq("counts_b3", "counts_b4"),
      s"disk must hold exactly the last two generations, got ${gens()}")
    // the re-delivery window survives the prune: re-deliver batch 4
    // (its predecessor counts_b3 is still on disk) — state unchanged
    val before = snapshot(state)
    CrawlStream.foldBatch(pages(40L until 50L), 4L, state, 1000, None, "graftbot")
    assert(snapshot(state) == before, "re-delivery after prune changed state")
    // and a crash-shaped re-delivery: batch 5 written but UNcommitted
    // (simulated by folding it normally — determinism from counts_b4
    // is what the marker protocol relies on), then re-delivered
    CrawlStream.foldBatch(pages(50L until 60L), 5L, state, 1000, None, "graftbot")
    val after5 = snapshot(state)
    CrawlStream.foldBatch(pages(50L until 60L), 5L, state, 1000, None, "graftbot")
    assert(snapshot(state) == after5)
    assert(gens() == Seq("counts_b4", "counts_b5"))
  }

  test("per-host cap and politeness ranking hold on every snapshot") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("crawl_cap").toString
    val delays = Seq(("t0.example", "*", 2000L), ("t1.example", "*", 1000L),
      ("t2.example", "*", 1000L)).toDF("host", "agent", "delay_ms")
    CrawlStream.foldBatch(pages(0L until 60L), 0L, state, maxPerHost = 3,
      Some(delays), "graftbot")
    val snap = spark.read.parquet(s"$state/frontier")
    val perHost = snap.groupBy("host").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perHost.nonEmpty && perHost.forall(_ <= 3), perHost.toSeq)
    // politeness: per-host fetch_seq dense from 0, offsets = seq*delay
    val rows = snap.select("host", "fetch_seq", "fetch_offset_ms")
      .as[(String, Int, Long)].collect().toSeq
    for ((host, grp) <- rows.groupBy(_._1)) {
      val seqs = grp.map(_._2).sorted
      assert(seqs == (0 until grp.size), s"$host seqs $seqs")
      val delay = if (host == "t0.example") 2000L else 1000L
      grp.foreach { case (_, sq, off) =>
        assert(off == sq * delay, s"$host seq=$sq off=$off") }
    }
  }
}

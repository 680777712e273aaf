package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.EventsStream

/** Structured Streaming surface: the SAME transforms run in batch (oracle
  * path, p14–p16) and as a real streaming query with watermarks here. */
class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  // awaitTermination's boolean must be ASSERTED: on a timeout the query is
  // still running while the test reads shared state, turning a slow
  // environment into a confusing downstream failure. stop() in the finally
  // so a timed-out query can't leak into the next test either.
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try assert(q.awaitTermination(120000), "stream did not drain in 120s")
    finally q.stop()

  test("streaming tumbling aggregate over file source matches batch result") {
    val batchEvents = Tables(spark, dir, "events")
    val expected = EventsStream.tumblingCounts(batchEvents)
      .orderBy("w_start", "event_type").collect()

    // stream the same parquet through readStream with a watermark; ts is
    // normalized to TIMESTAMP_LTZ exactly as the batch Tables loader
    // does, whatever the parquet encoding (nanos-long / NTZ / LTZ).
    // readStream needs a directory source; stage the single parquet file
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamRaw = spark.readStream.schema(schema).parquet(stage.toString)
    val stream = Tables.normalizeEventsTs(streamRaw)
    val q = EventsStream.streamingTumbling(stream, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("agg_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)

    // append mode only emits windows the watermark has closed; every
    // emitted row must match the batch result exactly
    val got = spark.table("agg_out").orderBy("w_start", "event_type").collect()
    assert(got.nonEmpty, "stream emitted no closed windows")
    val expectedSet = expected.map(_.toSeq).toSet
    got.foreach(r => assert(expectedSet.contains(r.toSeq), s"row $r not in batch result"))
    spark.sql("DROP TABLE IF EXISTS agg_out")
  }

  test("streaming sliding windows match batch; each event in two windows") {
    val batchEvents = Tables(spark, dir, "events")
    val expected = EventsStream.slidingCounts(batchEvents)
      .orderBy("w_start", "event_type").collect()
    // overlap invariant: total n across windows = 2 × event count
    val nTotal = expected.map(_.getLong(2)).sum
    assert(nTotal == 2 * batchEvents.count())

    val stage = java.nio.file.Files.createTempDirectory("events_slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
      .transform(Tables.normalizeEventsTs(_))
    val q = EventsStream.slidingCounts(stream.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("slide_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    val got = spark.table("slide_out").orderBy("w_start", "event_type").collect()
    assert(got.nonEmpty, "stream emitted no closed windows")
    val expectedSet = expected.map(_.toSeq).toSet
    got.foreach(r => assert(expectedSet.contains(r.toSeq), s"row $r not in batch result"))
    spark.sql("DROP TABLE IF EXISTS slide_out")
  }

  test("dailyRetention: hand-computed day-over-day returning users") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L),
      ("2024-01-02 09:00:00", 1L), ("2024-01-02 09:30:00", 3L),
      ("2024-01-03 08:00:00", 1L), ("2024-01-03 08:10:00", 3L),
      ("2024-01-03 09:00:00", 4L)
    ).toDF("ts_s", "user_id")
      .select(org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"), $"user_id")
    val out = EventsStream.dailyRetention(ev).orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 0L),   // 1,2 active; no prior day
      ("2024-01-02", 2L, 1L),   // 1,3 active; 1 returning
      ("2024-01-03", 3L, 2L)))  // 1,3,4 active; 1,3 returning
  }

  test("foreachBatch incremental dedup over a document stream matches batch") {
    import org.apache.spark.sql.DataFrame
    val docDir = "/root/testdata/sf0.001/documents.parquet"
    val all = spark.read.parquet(docDir)
    val corpus = all.where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0)
    val batchMode = graft.ops.Dedup.incrementalDedup(
      all.where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0), corpus)
      .collect().map(_.toSeq).toSet

    val stage = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(docDir),
      stage.resolve("documents.parquet"))
    val got = scala.collection.mutable.Set[Seq[Any]]()
    val q = spark.readStream.schema(all.schema).parquet(stage.toString)
      .where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got.synchronized {
          got ++= graft.ops.Dedup.incrementalDedup(batch, corpus)
            .collect().map(_.toSeq)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    assert(got.toSet == batchMode)
  }

  test("foreachBatch incremental dedup recovers from its checkpoint across a restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = all.where(col("doc_id") % 5 =!= 0)
    val batchDocs = all.where(col("doc_id") % 5 === 0)
    val half1 = batchDocs.where(col("doc_id") % 10 === 0)
    val half2 = batchDocs.where(col("doc_id") % 10 =!= 0)
    val expected = graft.ops.Dedup.incrementalDedup(batchDocs, corpus)
      .collect().map(_.toSeq).toSet
    val expected1 = graft.ops.Dedup.incrementalDedup(half1, corpus)
      .collect().map(_.toSeq).toSet

    val stage = java.nio.file.Files.createTempDirectory("docs_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("docs_restart_ckpt").toString
    // a BUFFER, not a set: re-processed rows after a bad recovery would
    // show up as extra emissions and fail the count assertion below
    val emitted = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def runUntilDrained(): Unit = {
      val q = spark.readStream.schema(all.schema).parquet(stage)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emitted.synchronized {
            emitted ++= graft.ops.Dedup.incrementalDedup(batch, corpus)
              .collect().map(_.toSeq)
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      drain(q)
    }

    half1.write.mode("append").parquet(stage)
    runUntilDrained() // processes half1, then the query STOPS (simulated kill)
    assert(emitted.nonEmpty && emitted.toSet == expected1)
    val afterFirst = emitted.size

    half2.write.mode("append").parquet(stage)
    runUntilDrained() // fresh query, same checkpoint dir → resumes after half1
    assert(emitted.toSet == expected, "end state after restart must equal one batch run")
    assert(emitted.size == afterFirst + (expected.size - expected1.size),
      s"restart re-processed already-committed files (${emitted.size} emissions)")
  }

  test("stateful tumbling agg over a FILE source: watermark state survives a checkpoint restart, sink stays exactly-once") {
    import org.apache.spark.sql.functions._
    // the memory-source restart test (above) covers foreachBatch; this
    // one pins the production shape — file source, parquet sink, REAL
    // watermark state (an open window's partial counts) carried across
    // a query kill + restart through the checkpoint.
    val batchEvents = Tables(spark, dir, "events")
    // split by TIME, not by hash: after the restart the watermark is
    // restored at max(half1.ts) - 10min, so a hash split would make
    // half2's older rows late (dropped) and the comparison meaningless.
    // The cut is the MIN ts inside the EARLIEST hour window with >= 2
    // distinct timestamps — by construction that window has rows on
    // both sides of the cut (a percentile cut can land on a window
    // boundary and leave nothing straddling), and being earliest it is
    // certainly closed by the final watermark.
    val cutMicros = batchEvents
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("ts")).as("_nts"),
        min(unix_micros(col("ts"))).as("_min"))
      .where(col("_nts") >= 2)
      .orderBy(col("window.start"))
      .select("_min").first().getLong(0)
    val half1 = batchEvents.where(unix_micros(col("ts")) <= cutMicros)
    val half2 = batchEvents.where(unix_micros(col("ts")) > cutMicros)
    assert(half1.count() > 0 && half2.count() > 0)

    val stage = java.nio.file.Files.createTempDirectory("file_restart_src").toString
    val sink = java.nio.file.Files.createTempDirectory("file_restart_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("file_restart_ckpt").toString
    half1.write.mode("append").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    def runUntilDrained(): Unit = {
      val q = EventsStream.streamingTumbling(
          spark.readStream.schema(schema).parquet(stage))
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      drain(q)
    }
    runUntilDrained() // processes half1, then STOPS (simulated kill)
    half2.write.mode("append").parquet(stage)
    runUntilDrained() // fresh query, same checkpoint → state + file log restored

    // the file-sink metadata log makes the read exactly-once-visible
    val got = spark.read.parquet(sink).collect()
    // 1. exactly-once per window across the two runs: a lost/ignored
    // checkpoint would re-emit half1's closed windows in run 2
    val keys = got.map(r => (r.getString(0), r.getString(1)))
    assert(keys.length == keys.distinct.length,
      "a (window, event_type) emitted twice across the restart")
    // 2. every emitted row matches the batch twin exactly — in
    // particular the window STRADDLING the cut, whose first half lived
    // only in checkpointed state when the query was killed
    val batch = EventsStream.tumblingCounts(batchEvents).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.nonEmpty, "stream emitted no closed windows")
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, total) = batch.getOrElse(k, fail(s"emitted $k not in batch result"))
      assert(r.getLong(2) == n, s"count for $k: got ${r.getLong(2)}, batch $n")
      assert(math.abs(r.getDouble(3) - total) < 1e-6, s"total for $k")
    }
    // 3. the straddling window must exist, be closed, and be whole —
    // this is the state-restoration proof (state lost ⇒ its count
    // covers only half2's rows and assertion 2 already failed; this
    // pins that the discriminating window was actually emitted)
    val cutWindows = EventsStream.tumblingCounts(
        batchEvents.where(unix_micros(col("ts")) <= cutMicros))
      .select("w_start").collect().map(_.getString(0)).toSet
    val straddling = EventsStream.tumblingCounts(half2)
      .select("w_start").collect().map(_.getString(0)).toSet
      .intersect(cutWindows)
    assert(straddling.nonEmpty, "time split landed on a window boundary")
    assert(straddling.subsetOf(got.map(_.getString(0)).toSet),
      "straddling window was never emitted")
  }

  test("funnel: hand-computed entries and conversions within the horizon") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click 10:00, purchase 10:30 → converted
      ("2024-01-01 10:00:00", 1L, "click"), ("2024-01-01 10:30:00", 1L, "purchase"),
      // user 2: click 10:00, purchase 11:30 → outside 1h, not converted
      ("2024-01-01 10:00:00", 2L, "click"), ("2024-01-01 11:30:00", 2L, "purchase"),
      // user 3: purchase BEFORE first click → not converted
      ("2024-01-02 09:00:00", 3L, "purchase"), ("2024-01-02 09:30:00", 3L, "click"),
      // user 4: purchase exactly at t0 + 1h → boundary inclusive, converted
      ("2024-01-02 08:00:00", 4L, "click"), ("2024-01-02 09:00:00", 4L, "purchase"),
      // user 5: no click → never enters the funnel
      ("2024-01-02 12:00:00", 5L, "purchase")
    ).toDF("ts_s", "user_id", "event_type")
      .select(org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"),
        $"user_id", $"event_type")
    val out = EventsStream.funnel(ev).orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("2024-01-01", 2L, 1L), ("2024-01-02", 2L, 1L)))
  }

  test("streaming dropDuplicates emits one row per key, matching batch distinct") {
    val stage = java.nio.file.Files.createTempDirectory("events_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
      .transform(Tables.normalizeEventsTs(_))
    val q = EventsStream.streamingDedup(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    val got = spark.table("dedup_out")
    val expected = Tables(spark, dir, "events")
      .select("user_id", "event_type").distinct().count()
    assert(got.count() == expected)
    assert(got.select("user_id", "event_type").distinct().count() == expected)
    spark.sql("DROP TABLE IF EXISTS dedup_out")
  }

  test("flatMapGroupsWithState running stats match a batch aggregate") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("events_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
      .selectExpr("user_id", "event_id", "value")
      .as[EventsStream.UserEvent]
    val q = EventsStream.runningUserStats(stream)
      .writeStream.outputMode("append").format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    // final state per user (last emitted row) must equal the batch agg
    val got = spark.table("state_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"),
        org.apache.spark.sql.functions.max("max_event").as("max_event"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count("*").as("n_events"),
        org.apache.spark.sql.functions.max("event_id").as("max_event"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS state_out")
  }

  test("streaming sessionize (session_window + watermark) matches batch") {
    val batchEvents = Tables(spark, dir, "events")
    val expected = EventsStream.sessionize(batchEvents)
      .orderBy("s_start", "user_id").collect()

    val stage = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
      .transform(Tables.normalizeEventsTs(_))
    val q = EventsStream.sessionize(stream.withWatermark("ts", "1 hour"))
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    // append mode only emits sessions the watermark closed; every
    // emitted session must exist verbatim in the batch result
    val got = spark.table("sess_out").orderBy("s_start", "user_id").collect()
    assert(got.nonEmpty, "stream emitted no closed sessions")
    val expectedSet = expected.map(_.toSeq).toSet
    got.foreach(r => assert(expectedSet.contains(r.toSeq), s"session $r not in batch result"))
    spark.sql("DROP TABLE IF EXISTS sess_out")
  }

  test("sessionize groups events within the gap") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(min: Int) = new java.sql.Timestamp(ts0.getTime + min * 60000L)
    val ev = Seq(
      (1L, t(0), 10.0), (1L, t(10), 5.0),   // session 1 (gap 30m)
      (1L, t(90), 2.0),                      // session 2
      (2L, t(0), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventsStream.sessionize(ev).orderBy("user_id", "s_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Double]("session_value") == 15.0)
  }

  test("stream-stream interval join matches the batch join exactly") {
    import org.apache.spark.sql.functions._
    val batch = Tables(spark, dir, "events")
    def side(tpe: String, tsName: String, idName: String) = batch
      .where(col("event_type") === tpe)
      .select(col("user_id"), col("ts").as(tsName), col("event_id").as(idName))
    val expected = EventsStream.clickAttribution(
        side("click", "click_ts", "click_id"),
        side("purchase", "purchase_ts", "purchase_id"), "1 hour")
      .orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(expected.nonEmpty, "batch join produced no pairs — test data too sparse")

    val stage = java.nio.file.Files.createTempDirectory("events_ssjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def streamSide(tpe: String, tsName: String, idName: String) = spark.readStream
      .schema(schema).parquet(stage.toString)
      .transform(Tables.normalizeEventsTs(_))
      .where(col("event_type") === tpe)
      .select(col("user_id"), col("ts").as(tsName), col("event_id").as(idName))
      // both sides watermarked: with the range predicate this is what
      // bounds the join state to the horizon
      .withWatermark(tsName, "10 minutes")
    val q = EventsStream.clickAttribution(
        streamSide("click", "click_ts", "click_id"),
        streamSide("purchase", "purchase_ts", "purchase_id"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("ssjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)

    val got = spark.table("ssjoin_out").orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    spark.sql("DROP TABLE IF EXISTS ssjoin_out")
  }

  test("stream-static broadcast enrichment matches batch; unmatched keys survive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val batch = Tables(spark, dir, "events")
    // dimension covers SOME event types only — the left join must keep
    // the rest with a null tier
    val dim = Seq(("click", "engage"), ("purchase", "convert")).toDF("event_type", "tier")
    val expected = EventsStream.enrichStatic(batch, dim, Seq("event_type"))
      .select("event_id", "tier").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(expected.exists(_._2.isEmpty), "need uncovered event types for the test to bite")

    val stage = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
      .transform(Tables.normalizeEventsTs(_))
    val q = EventsStream.enrichStatic(stream, dim, Seq("event_type"))
      .select("event_id", "tier")
      .writeStream.outputMode("append").format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)

    val got = spark.table("enrich_out").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq == expected.toSeq)
    spark.sql("DROP TABLE IF EXISTS enrich_out")
  }

  test("streaming OHLC bars match batch bar-for-bar under the watermark") {
    import org.apache.spark.sql.streaming.Trigger
    val batchEvents = Tables(spark, dir, "events")
    val expected = EventsStream.streamingOhlc(batchEvents)
      .orderBy("w_start", "event_type").collect()
    val stage = java.nio.file.Files.createTempDirectory("ohlc_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(stage.toString))
    val q = EventsStream.streamingOhlc(stream.withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("ohlc_out")
      .trigger(Trigger.AvailableNow()).start()
    drain(q)
    val got = spark.table("ohlc_out").collect()
    assert(got.nonEmpty, "stream emitted no closed bars")
    // every emitted (closed) bar is bit-identical to its batch twin
    val expectedSet = expected.map(_.toSeq).toSet
    got.foreach(r => assert(expectedSet.contains(r.toSeq), s"bar $r not in batch result"))
    spark.sql("DROP TABLE IF EXISTS ohlc_out")
  }

  test("rate source (UNBOUNDED): watermark drops late rows and bounds state") {
    import org.apache.spark.sql.functions._
    // The file-source specs can't pin late-row semantics — a file
    // source ends, so every row eventually arrives "on time". The rate
    // source never ends: rows ride the clock forward except every
    // 10th, which is shifted back ONE HOUR — far past the 10-second
    // watermark — so from the second batch on the state operator must
    // (a) count them in numRowsDroppedByWatermark, never aggregate
    // them, and (b) evict closed windows: state stays at the handful
    // of 5-second windows inside the watermark horizon, not one per
    // window ever seen (the unbounded-state failure mode).
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
    val withTs = rate.select(
      when(col("value") % 10 === 7,
        col("timestamp") - expr("INTERVAL 1 HOUR"))
        .otherwise(col("timestamp")).as("ts"))
    val agg = withTs.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "5 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("rate_wm")
      .outputMode("update").start()
    try {
      val seen = scala.collection.mutable.Set[Long]()
      var dropped = 0L
      var maxState = 0L
      var batches = 0
      var waited = 0
      while ((dropped == 0 || batches < 3) && waited < 90) {
        Thread.sleep(1000); waited += 1
        for (p <- q.recentProgress if seen.add(p.batchId);
             so <- p.stateOperators) {
          batches += 1
          dropped += so.numRowsDroppedByWatermark
          maxState = math.max(maxState, so.numRowsTotal)
        }
      }
      assert(dropped > 0,
        s"late rows (1 h behind a 10 s watermark) were never dropped " +
          s"($batches state batches in $waited s)")
      // horizon = watermark 10 s + window 5 s ⇒ a few live windows;
      // 24 allows generous trigger jitter, while one-window-per-batch
      // leakage at 1 h of backdated windows would blow far past it
      assert(maxState <= 24L,
        s"state grew to $maxState windows — closed windows not evicted")
      assert(spark.sql("SELECT * FROM rate_wm").count() > 0)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS rate_wm")
    }
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming surface over the events table (SURVEY §2.10
  * phase 2). Transformations are defined once as batch-agnostic
  * `DataFrame => DataFrame` so the SAME code runs in a batch query (the
  * oracle-checkable path) and under `readStream` with watermarks (the
  * production path, exercised in EventsStreamSpec via the memory sink).
  */
object EventsStream {

  /** Tumbling-window aggregate per event type. With a streaming source
    * the preceding `withWatermark` bounds state; in batch it is a plain
    * window-bucket groupBy. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total"))

  /** SLIDING-window aggregate (overlapping windows — each event lands in
    * windowLen/slide windows): the moving-average/rate shape. Same
    * watermark story as [[tumblingCounts]]; in batch, Spark expands each
    * row into its windows before the groupBy, so shuffle volume is
    * rows × (windowLen/slide). */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("total"))

  /** Day-over-day retention: per day, distinct active users and how many
    * were also active the previous day — the engagement metric every
    * event pipeline reports. Formulated WITHOUT a self-join: one
    * (day, user) distinct, then `lag(day)` over a per-user window —
    * "returning" ⇔ previous active day is exactly day−1. Two shuffles
    * total over slim pairs; the naive self-join variant scanned events
    * and recomputed the distinct three times and tempted the optimizer
    * into broadcasting a data-sized side (measured 4× slower at 1M
    * events). */
  def dailyRetention(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .withColumn("_prev", lag(col("day"), 1).over(w))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(datediff(col("day"), col("_prev")) === 1, 1L).otherwise(0L))
          .as("n_returning"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_returning"))
  }

  /** Conversion funnel: a user ENTERS at their first `fromType` event
    * and CONVERTS if any `toType` event lands within `horizon` of it
    * (inclusive). Single-shuffle formulation: both the entry time and
    * the conversion flag are per-user window aggregates over one
    * hash-partition by user — the follow-up groupBy(user) reuses that
    * partitioning (no second data-sized shuffle), and the day rollup
    * aggregates ≤ |users| slim rows. */
  def funnel(
      events: DataFrame,
      fromType: String = "click",
      toType: String = "purchase",
      horizon: String = "1 hour"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    events
      .withColumn("_t0",
        min(when(col("event_type") === fromType, col("ts"))).over(w))
      .where(col("_t0").isNotNull)
      .withColumn("_c",
        max(when(col("event_type") === toType &&
          col("ts") >= col("_t0") &&
          col("ts") <= col("_t0") + expr(s"INTERVAL $horizon"), 1L)
          .otherwise(0L)).over(w))
      .groupBy("user_id").agg(min("_t0").as("t0"), max("_c").as("conv"))
      .groupBy(to_date(col("t0")).as("day"))
      .agg(count(lit(1)).as("n_entered"), sum("conv").as("n_converted"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_entered"), col("n_converted"))
  }

  /** Streaming dedup shape: first event per (user_id, event_type) within
    * the watermark horizon. Batch equivalent: min per group. */
  def dedupFirstPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n"))

  /** Session windows per user (30 min gap): streaming-native
    * session_window, also valid in batch. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Attach the production streaming wrapper: watermark + the same
    * transform. `events` must be a streaming DataFrame (readStream). */
  def streamingTumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark))

  /** Streaming exactly-once-per-key dedup: watermark-bounded
    * dropDuplicates — state for a key is dropped once the watermark
    * passes it, so state size is bounded by the horizon, not the stream. */
  def streamingDedup(
      events: DataFrame,
      keys: Seq[String] = Seq("user_id", "event_type"),
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(keys)

  /** Stream-stream interval join (click→purchase attribution): each
    * purchase pairs with the same user's clicks in the `horizon` before
    * it. Works identically over batch frames and over two watermarked
    * streams — in streaming, the time-range predicate is exactly what
    * lets Spark BOUND the join state (a click older than
    * `watermark + horizon` can never match a future purchase and is
    * evicted), so state size follows the horizon, not the stream.
    * Inputs must carry (user_id, click_ts/click_id) and
    * (user_id, purchase_ts/purchase_id). */
  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour"): DataFrame = {
    // rename the key per side: both inputs often derive from the same
    // frame (one events table filtered twice), and self-join column
    // resolution must not depend on dataset-id disambiguation
    val c = clicks.select(col("user_id").as("_cu"), col("click_ts"), col("click_id"))
    val p = purchases.select(col("user_id").as("_pu"), col("purchase_ts"), col("purchase_id"))
    c.join(p,
      col("_cu") === col("_pu") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("click_id"))
  }

  /** Stream-STATIC enrichment join: every micro-batch joins the bounded
    * dimension table BROADCAST — the standard shape for decorating an
    * event stream with reference data. Unlike a stream-stream join it
    * keeps NO join state (the static side is re-resolved per batch, so
    * a dimension refresh on disk is picked up batch-over-batch), and
    * LEFT join keeps events whose key has no dimension row yet — an
    * enrichment must never drop facts. Identical over batch frames. */
  def enrichStatic(
      events: DataFrame,
      dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** OHLC candlesticks per (type, tumbling window) — the streaming form
    * of [[graft.ops.EventsOps.ohlcBars]], same struct-min/max open/close
    * trick (a pure aggregation, so it runs under watermarked
    * `readStream` append mode with no extra state machinery; the batch
    * twin on identical data must agree bar-for-bar — spec-pinned).
    * Returns (w_start, event_type, n_events, open/high/low/close_micro,
    * volume_micro), values in BIGINT micro-units. */
  def streamingOhlc(events: DataFrame, windowLen: String = "1 hour"): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val sec = floor(unix_micros(col("ts")).cast("double") / lit(1000000.0d)).cast("long")
    events
      .withColumn("_s", sec)
      .withColumn("_v", floor(col("value").cast("double") * lit(1000000.0d)).cast("long"))
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("_s"), col("event_id").as("_t"), col("_v"))).as("_first"),
        max(struct(col("_s"), col("event_id").as("_t"), col("_v"))).as("_last"),
        max(col("_v")).as("high_micro"),
        min(col("_v")).as("low_micro"),
        sum(col("_v").cast(d)).cast("long").as("volume_micro"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n_events"),
        col("_first._v").as("open_micro"), col("high_micro"),
        col("low_micro"), col("_last._v").as("close_micro"), col("volume_micro"))
  }

  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double, max_event: Long)

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * aggregate emitted on every trigger — the arbitrary-state shape for
    * logic windows/watermarks can't express. Works identically over a
    * batch-derived Dataset in tests and a streaming one in production. */
  def runningUserStats(
      events: org.apache.spark.sql.Dataset[UserEvent]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0, -1L))
          val next = rows.foldLeft(prev)((acc, e) => UserRunning(
            user, acc.n_events + 1, acc.total_value + e.value,
            math.max(acc.max_event, e.event_id)))
          state.update(next)
          Iterator(next)
      }
      .toDF()
  }
}

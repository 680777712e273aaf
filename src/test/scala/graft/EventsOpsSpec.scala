package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventsOps

class EventsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseProps extracts typed k; malformed / missing come out null") {
    val ev = Seq(
      (1L, """{"k": 42}"""),
      (2L, """{"k": 7, "other": "x"}"""),
      (3L, """not json at all"""),
      (4L, """{"no_k": 1}"""),
      (5L, null.asInstanceOf[String])
    ).toDF("event_id", "props")
    val out = EventsOps.parseProps(ev).orderBy("event_id")
      .select("prop_k").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(42L), Some(7L), None, None, None))
  }

  test("valueOutliers: hand-computed 3-sigma counts, exact arithmetic") {
    // group "a": 19 ones + one 100 → mean 5.95, sample σ ≈ 22.14,
    // z(100) ≈ 4.25 → exactly one outlier; the ones are z ≈ 0.22.
    // group "b": constant values → σ = 0 → no outliers.
    // group "c": singleton → n < 2 → no outliers by definition.
    val rows =
      Seq.fill(19)(("a", 1.0)) ++ Seq(("a", 100.0)) ++
        Seq(("b", 5.0), ("b", 5.0), ("b", 5.0)) ++
        Seq(("c", 123.456))
    val out = EventsOps.valueOutliers(
        rows.toDF("event_type", "value"), "event_type", "value")
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 20L, 1L), ("b", 3L, 0L), ("c", 1L, 0L)))
  }

  test("valueOutliers boundary: z just under 3 is not an outlier") {
    // 10 points: nine 1.0 and one 100.0 → z(100) ≈ 2.846 < 3 → zero
    // outliers even though the point looks extreme (small-n ceiling)
    val rows = Seq.fill(9)(("g", 1.0)) ++ Seq(("g", 100.0))
    val out = EventsOps.valueOutliers(rows.toDF("event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("g", 10L, 0L)))
  }

  test("valueOutliers: NULL measures count toward n_rows, never outliers") {
    val rows = (Seq.fill(19)(("a", Some(1.0))) ++
      Seq(("a", Some(100.0)), ("a", None), ("a", None))).map {
      case (g, v) => (g, v.map(Double.box).orNull)
    }
    val out = EventsOps.valueOutliers(rows.toDF("event_type", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // n = 22 (nulls included) shifts the sample stats vs the 20-row case,
    // but 100.0 is still the lone >3σ point and nulls are never outliers
    assert(out.toSeq == Seq(("a", 22L, 1L)))
  }

  test("valueOutliers: unbounded group cardinality, fully lazy construction") {
    // round-10 verdict #2: the old implementation collected one row per
    // group to the driver at CONSTRUCTION time (both a job-at-build and
    // a high-cardinality driver-memory hazard). The native
    // outlier_threshold expression keeps the BigInt math in-plan, so
    // (a) building the DataFrame fires no job, and (b) thousands of
    // groups are just rows in the broadcast side.
    val group = "voutliers-construction-probe"
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group))
          seen.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup(group, "construction probe")
      // 2000 groups × 21 rows: one planted >3σ point per group
      val rows = (0 until 2000).flatMap { g =>
        Seq.fill(20)((s"g$g", 1.0)) :+ (s"g$g", 100.0)
      }
      val df = EventsOps.valueOutliers(rows.toDF("event_type", "value"))
      spark.sparkContext.parallelize(Seq(1)).count() // flush marker
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get() == 0 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(seen.get() == 1, s"expected only the flush job, saw ${seen.get()}")
      val out = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.length == 2000)
      assert(out.forall { case (_, n, o) => n == 21L && o == 1L })
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("rollingStats: per-key bounded frame, micro-unit integer sums, total order") {
    val ev = Seq(
      // user 1: values 1,2,3,4 in ts order; frame 3
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1.5),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2.5),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 3.0),
      (4L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 4.0),
      // user 2: two events at the SAME ts — event_id breaks the tie
      (6L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 10.0),
      (5L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 20.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.rollingStats(ev, frame = 3)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // roll_* are BIGINT micro-units: floor(value*1e6)
    assert(out.toSeq == Seq(
      (1L, 1L, 1500000L, 1500000L, 1500000L),
      (2L, 2L, 4000000L, 1500000L, 2500000L),
      (3L, 3L, 7000000L, 1500000L, 3000000L),
      (4L, 3L, 9500000L, 2500000L, 4000000L), // frame slid: 1.5 dropped out
      (5L, 1L, 20000000L, 20000000L, 20000000L), // id 5 FIRST within the tie
      (6L, 2L, 30000000L, 10000000L, 20000000L)))
  }

  test("rollingRange: time-defined frame, same-second ties see each other") {
    val ev = Seq(
      // user 1: t=0, 30, 100; window 60s
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2.0),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:40"), 4.0),
      // user 2: two events at the SAME second — RANGE frames include
      // both for both rows (value-defined membership, unlike ROWS)
      (4L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 10.0),
      (5L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 20.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.rollingRange(ev, windowSeconds = 60L)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1000000L),          // alone
      (2L, 2L, 3000000L),          // t=30 sees t=0
      (3L, 1L, 4000000L),          // t=100: t=30 is 70s back — outside
      (4L, 2L, 30000000L),         // both same-second rows in frame
      (5L, 2L, 30000000L)))
  }

  test("valueOutliers overflows LOUDLY, never a silent wrong answer") {
    // |value| ≥ 1e12 breaks the DECIMAL(18,6) fixed-point cast → raise
    val tooBig = Seq(("g", 2.0e12), ("g", 1.0))
    val e1 = intercept[Exception] {
      EventsOps.valueOutliers(tooBig.toDF("event_type", "value")).collect()
    }
    assert(e1.toString.contains("valueOutliers") ||
      Option(e1.getCause).exists(_.toString.contains("valueOutliers")))
    // Σv² past DECIMAL(38,0): 400 rows of 5e11 (v6=5e17, v6²=2.5e35,
    // Σ=1e38) → the driver-side aggregation guard must throw, not
    // classify every boundary row as "not an outlier"
    val aggOver = Seq.fill(400)(("g", 5.0e11)) ++ Seq(("g", 1.0))
    val e2 = intercept[Exception] {
      EventsOps.valueOutliers(aggOver.toDF("event_type", "value")).collect()
    }
    assert(e2.toString.contains("overflow") ||
      Option(e2.getCause).exists(_.toString.contains("overflow")))
  }

  test("temporalSplit: gap rows dropped, boundaries exact, no eval before train ends") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // 10 events at t = 0..9000s step 1000; p80 cutoff = 7200s
    // (7000 + 0.2·1000 interpolated, floored); gap 1500s: 8000 falls
    // inside (7200, 8700] → dropped; 9000 > 8700 → eval
    val ev = (0 until 10).map(i => (i.toLong, ts(i * 1000L), 1L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventsOps.temporalSplit(ev, trainFrac = 0.8, gapSeconds = 1500L)
      .select("event_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0 to 7).forall(i => out(i.toLong) == "train"))
    assert(out(8L) == "dropped")
    assert(out(9L) == "eval")
    // leakage invariant: max train time + gap < min eval time
    assert(7000L + 1500L < 9000L)
  }

  test("winsorize: clamps to the exact per-group percentile envelope") {
    // group g: values 1..10 → p05 = 1.45, p95 = 9.55 (linear interp);
    // 1 clamps up to 1.45, 10 clamps down to 9.55, 5 passes through
    val ev = (1 to 10).map(i => (i.toLong, "g", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val out = EventsOps.winsorize(ev).orderBy("event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1450000L)
    assert(out(5L) == 5000000L)
    assert(out(10L) == 9549999L || out(10L) == 9550000L) // 9.55 is not exact in binary
    // interior values are untouched micro-units
    assert(out(7L) == 7000000L)
  }

  test("temporalSplit/winsorize: rank-ladder percentiles reproduce Spark's exact percentile aggregate on real data") {
    // the rewrite's contract: bit-for-bit the values the `percentile`
    // value-buffer aggregate produced (same IEEE position/interpolation),
    // without that aggregate anywhere in the plan
    val ev = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
    val twinBounds = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.05D)").as("_plo"),
      expr("percentile(value, 0.95D)").as("_phi"))
    val twinW = ev.join(twinBounds, Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        floor(least(greatest(col("value"), col("_plo")), col("_phi")) * lit(1000000.0d))
          .cast("long").as("v_w"))
    val w = EventsOps.winsorize(ev)
    assert(w.exceptAll(twinW).isEmpty && twinW.exceptAll(w).isEmpty)

    val tSec = floor(unix_micros(col("ts")).cast("double") / lit(1000000.0d)).cast("long")
    val cut = ev.select(tSec.as("_t"))
      .agg(expr("CAST(floor(percentile(_t, 0.8D)) AS LONG)")).first().getLong(0)
    val twinT = ev.select(col("event_id"),
      when(tSec <= cut, "train").when(tSec > cut + 3600L, "eval")
        .otherwise("dropped").as("split"))
    val t = EventsOps.temporalSplit(ev).select("event_id", "split")
    assert(t.exceptAll(twinT).isEmpty && twinT.exceptAll(t).isEmpty)
  }

  test("temporalSplit: no Spark job fires at DataFrame construction") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val group = "tsplit-construction-probe"
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        // count ONLY this test's job group — late-delivered events from
        // earlier tests' jobs must not flake the count
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group))
          seen.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.sparkContext.setJobGroup(group, "construction probe")
      val ev = (0 until 5).map(i => (i.toLong, ts(i * 100L)))
        .toDF("event_id", "ts")
      val df = EventsOps.temporalSplit(ev)
      // flush marker: the listener bus is FIFO, so once this job's
      // start event lands, any construction-time job would have too
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get() == 0 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(seen.get() == 1, s"expected only the flush job, saw ${seen.get()}")
      // and the plan still executes correctly afterwards
      assert(df.where(col("split") === "train").count() > 0)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("temporalSplit: empty input yields empty output; all-NULL ts raises lazily") {
    val empty = Seq((1L, new java.sql.Timestamp(0L)))
      .toDF("event_id", "ts").where(col("event_id") < 0)
    assert(EventsOps.temporalSplit(empty).collect().isEmpty)
    // rows exist but no usable timestamp → labeling against a NULL cut
    // is refused in-plan, not silently mislabeled
    val allNull = Seq((1L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("event_id", "ts")
    val df = EventsOps.temporalSplit(allNull) // must not throw here
    val e = intercept[Exception] { df.collect() }
    assert(e.toString.contains("empty input") ||
      Option(e.getCause).exists(_.toString.contains("empty input")))
  }

  test("conformalInterval: ceiling rank where floor differs (distinct residuals)") {
    // n = 10, α = 10%: ceil((n+1)(1−α)) = ceil(9.9) = 10, while the
    // floor formula gives 9 — distinct residuals make the difference
    // observable. values 2^i: mean = 2046/10 = 204.6 → floored micro
    // 204600000; residuals |v−mean| are all distinct, the largest
    // (1024 → 819400000) is the 10th order statistic.
    val ev = (1 to 10).map(i => (i.toLong, "g", math.pow(2.0, i.toDouble)))
      .toDF("event_id", "event_type", "value")
    val r = EventsOps.conformalInterval(ev).collect().head
    assert(r.getLong(1) == 10L)
    val mean = r.getLong(2)
    assert(mean == 204600000L)
    // q = the LARGEST residual (rank 10), not the second-largest
    assert(r.getLong(3) == 1024000000L - mean)
  }

  test("interpolateLinear: hand-computed gap fill, edges stay NULL") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L, Some(10.0)),
      (1L, ts(10), 2L, Option.empty[Double]), // halfway → 15.0
      (1L, ts(20), 3L, Some(20.0)),
      (1L, ts(25), 4L, Option.empty[Double]), // trailing → NULL
      (2L, ts(0), 5L, Option.empty[Double]),  // leading → NULL
      (2L, ts(5), 6L, Some(7.5)),
      (2L, ts(8), 7L, Option.empty[Double]),  // 3/5 of 7.5→10.0 gap: 9.0
      (2L, ts(10), 8L, Some(10.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val out = EventsOps.interpolateLinear(ev).orderBy("event_id").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L) == Some(10000000L))
    assert(out(2L) == Some(15000000L))
    assert(out(4L) == None)
    assert(out(5L) == None)
    assert(out(7L) == Some(9000000L))
  }

  test("rollingActiveUsers: trailing distinct via contribution intervals") {
    def ts(day: Long, off: Long = 3600L) = new java.sql.Timestamp((day * 86400L + off) * 1000L)
    val ev = Seq(
      // u1 active days 0, 2, 10 (two events day 0 — dedup must fold them)
      (1L, 1L, ts(0)), (2L, 1L, ts(0, 7200L)), (3L, 1L, ts(2)), (4L, 1L, ts(10)),
      // u2 active day 2 only
      (5L, 2L, ts(2))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.rollingActiveUsers(ev, windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // day 2 window {0,1,2}: u1 (active 0 and 2) counted ONCE, u2 once;
    // day 10 window {8,9,10}: only u1
    assert(out.toSeq == Seq((0L, 1L, 1L), (2L, 2L, 2L), (10L, 1L, 1L)))
  }

  test("rollingActiveUsers matches a brute-force distinct per observed day") {
    val ev = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
    val w = 7
    val got = EventsOps.rollingActiveUsers(ev, windowDays = w)
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = ev.select(col("user_id"),
        expr("(unix_micros(ts) div 1000000) div 86400").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = pairs.map(_._2).distinct.sorted
    val want = days.map { d =>
      val dau = pairs.count(_._2 == d).toLong
      val wau = pairs.filter(p => p._2 > d - w && p._2 <= d).map(_._1).distinct.length.toLong
      (d, dau, wau)
    }
    assert(got.toSeq == want.toSeq)
  }

  test("ewmaSmooth: hand-computed half-decay weights, growing frame") {
    val ev = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1.0),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2.0),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 3.0),
      // user 2: constant series — EWMA must reproduce it exactly
      (4L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7.25),
      (5L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7.25)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.ewmaSmooth(ev, frame = 8)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    // weight 2^(m-1-k) for lag k, denominator 2^m - 1, micro-units:
    //   id 1 (m=1): 1e6
    //   id 2 (m=2): (2e6·2 + 1e6)/3   = 1666666 (floor)
    //   id 3 (m=3): (3e6·4 + 2e6·2 + 1e6)/7 = 2428571 (floor)
    assert(out.toSeq == Seq(
      (1L, 1, 1000000L),
      (2L, 2, 1666666L),
      (3L, 3, 2428571L),
      (4L, 1, 7250000L),
      (5L, 2, 7250000L)))
  }

  test("ewmaSmooth: frame truncation matches a driver-side fold on a long series") {
    val frame = 4
    val values = (1 to 20).map(i => ((i * 37) % 11 + 0.5) * (if (i % 3 == 0) -1 else 1))
    val ev = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, new java.sql.Timestamp(1700000000000L + i * 1000L), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val got = EventsOps.ewmaSmooth(ev, frame = frame).orderBy("event_id")
      .collect().map(r => r.getLong(3))
    val micro = values.map(v => math.floor(v * 1e6).toLong)
    val want = micro.indices.map { t =>
      val m = math.min(t + 1, frame)
      val num = (0 until m).map(k => BigInt(micro(t - k)) << (m - 1 - k)).sum
      math.floor(num.toDouble / ((1L << m) - 1)).toLong
    }
    assert(got.toSeq == want)
  }

  test("interpolateLinear: floor on non-exact thirds, same-second neighbors") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L, Some(0.0)),
      (1L, ts(1), 2L, Option.empty[Double]), // 1/3 of 1.0 → floor(333333.33)
      (1L, ts(3), 3L, Some(1.0)),
      (2L, ts(5), 4L, Some(2.0)),
      (2L, ts(5), 5L, Option.empty[Double]), // same-second neighbors → prev
      (2L, ts(5), 6L, Some(4.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val out = EventsOps.interpolateLinear(ev).orderBy("event_id").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(2L) == 333333L)
    assert(out(5L) == 2000000L)
  }

  test("intervalCoverage: hand-computed union of overlapping TTL intervals") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: [0,10) ∪ [5,15) ∪ [30,40)  → 15 + 10 = 25 covered, span 40
    // user 2: duplicate timestamps [7,17)×3 → 10 covered, 3 events
    // user 3: chain [0,10) ∪ [10,20) touching, no gap → 20 covered
    val ev = Seq(
      (1L, ts(0)), (1L, ts(5)), (1L, ts(30)),
      (2L, ts(7)), (2L, ts(7)), (2L, ts(7)),
      (3L, ts(0)), (3L, ts(10))
    ).toDF("user_id", "ts")
    val out = EventsOps.intervalCoverage(ev, ttlSeconds = 10L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 25L, 40L),
      (2L, 3L, 10L, 10L),
      (3L, 2L, 20L, 20L)))
  }

  test("groupTrend: exact slopes, toward-zero truncation, zero-variance NULL") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), Some(0.0)), (1L, ts(86400), Some(1.0)),     // +1e6 µ/day exact
      (2L, ts(0), Some(1.0)), (2L, ts(86400), Some(0.0)),     // −1e6 µ/day exact
      (3L, ts(0), Some(0.0)), (3L, ts(7), Some(0.000001)),    // 86400/7 → trunc 12342
      (4L, ts(0), Some(0.000001)), (4L, ts(7), Some(0.0)),    // negative trunc toward 0
      (5L, ts(5), Some(1.0)), (5L, ts(5), Some(2.0)),         // den = 0 → NULL
      (6L, ts(9), Some(3.0)),                                  // single point → NULL
      (7L, ts(0), Some(1.0)), (7L, ts(10), None), (7L, ts(20), Some(1.0)) // nulls skipped
    ).map { case (u, t, v) => (u, t, v.map(Double.box).orNull) }
      .toDF("user_id", "ts", "value")
    val out = EventsOps.groupTrend(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, 2L, Some(1000000L)),
      (2L, 2L, Some(-1000000L)),
      (3L, 2L, Some(12342L)),
      (4L, 2L, Some(-12342L)),
      (5L, 2L, None),
      (6L, 1L, None),
      (7L, 2L, Some(0L))))
  }

  test("madOutliers: hand-computed medians, MAD=0 degenerate, robust flag") {
    // "a": [10,12,14,16,100] → med 14, devs [4,2,0,2,86], MAD 2 → only
    //   100 flagged (dev 86 > 6); the mean/σ test would be dragged by 100
    // "b": 1..7 → med 4, MAD 2 → nothing beats dev > 6
    // "c": [1,1,1,1,10] → MAD 0 degenerate → the 10 flagged (dev > 0)
    val rows =
      Seq(("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 14.0), ("a", 4L, 16.0), ("a", 5L, 100.0)) ++
        (1 to 7).map(i => ("b", 10L + i, i.toDouble)) ++
        Seq(("c", 21L, 1.0), ("c", 22L, 1.0), ("c", 23L, 1.0), ("c", 24L, 1.0), ("c", 25L, 10.0))
    val out = EventsOps.madOutliers(
        rows.toDF("event_type", "event_id", "value"), k = 3)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (5L, "a", 100000000L, 14000000L, 2000000L),
      (25L, "c", 10000000L, 1000000L, 0L)))
  }

  test("journeyMotifs: gap splits sessions, path truncates, deterministic top-k") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // u1 session 1: v>c>b(+extra truncated); session 2 after the gap: v>c
      (1L, ts(0), 1L, "v"), (1L, ts(10), 2L, "c"), (1L, ts(20), 3L, "b"),
      (1L, ts(30), 4L, "x"),
      (1L, ts(5000), 5L, "v"), (1L, ts(5010), 6L, "c"),
      // u2: one session v>c
      (2L, ts(0), 7L, "v"), (2L, ts(100), 8L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventsOps.journeyMotifs(ev, gapSeconds = 1800L, pathLen = 3, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("v>c", 2L), ("v>c>b", 1L)))
  }

  test("cohortMatrix: week cohorts, age-0 normalizer, pre-signup activity ignored") {
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val ev = Seq(
      // cohort week 0: u1 signs up day 0, active weeks 0 and 2
      (1L, ts(0), "signup"), (1L, ts(1), "click"), (1L, ts(15), "view"),
      // cohort week 0: u2 signs up day 3, never seen again
      (2L, ts(3), "signup"),
      // cohort week 1: u3 signs up day 8, active week 2; its day-2
      // pre-signup click must NOT create a negative age cell
      (3L, ts(2), "click"), (3L, ts(8), "signup"), (3L, ts(14), "view"),
      // no signup at all → excluded entirely
      (4L, ts(0), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventsOps.cohortMatrix(ev)
      .orderBy("cohort_week", "age_weeks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 1000000L), // u1+u2 week 0
      (0L, 2L, 1L, 500000L),  // only u1 returns (50%)
      (1L, 0L, 1L, 1000000L), // u3
      (1L, 1L, 1L, 1000000L)))// u3 week 2 = age 1
  }

  test("conversionLatency: first-view→first-later-purchase, ordered-pair gating") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(100), "purchase"), (1L, ts(200), "purchase"),
      (2L, ts(0), "view"), (2L, ts(50), "purchase"),
      (3L, ts(10), "purchase"),                      // never viewed → out
      (4L, ts(5), "purchase"), (4L, ts(10), "view"), // purchase precedes → out
      (5L, ts(7), "view"), (5L, ts(7), "purchase")   // same second → latency 0
    ).toDF("user_id", "ts", "event_type")
    val out = EventsOps.conversionLatency(ev, buckets = 2)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // latencies: u1=100, u2=50, u5=0; median 50 → deciles 2,2,1
    assert(out.toSeq == Seq((1L, 100L, 2), (2L, 50L, 2), (5L, 0L, 1)))
  }

  test("transitionMotifs: per-key consecutive pairs only, deterministic top-k") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "buy"),
      (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"),
      (3L, ts(1), 6L, "view"), (3L, ts(2), 7L, "click"),
      (4L, ts(9), 8L, "buy") // singleton stream emits no transition
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventsOps.transitionMotifs(ev, topK = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // view→click ×3; click→buy ×1; buy never precedes anything cross-key
    assert(out.toSeq == Seq(("view", "click", 3L), ("click", "buy", 1L)))
  }

  test("changePoint: CUSUM argmax lands on the level shift, ties take earliest") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // step 0→10 after 3 samples: |S| peaks at i=3 (last pre-shift row)
      (1L, ts(1), 1L, 0.0), (1L, ts(2), 2L, 0.0), (1L, ts(3), 3L, 0.0),
      (1L, ts(4), 4L, 10.0), (1L, ts(5), 5L, 10.0), (1L, ts(6), 6L, 10.0),
      // constant series: every S = 0 → earliest index wins
      (2L, ts(1), 7L, 5.0), (2L, ts(2), 8L, 5.0), (2L, ts(3), 9L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = EventsOps.changePoint(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, 3, 3L, 15000000L), // |S|=9e7, /n=1.5e7 µ — shift located
      (2L, 3L, 1, 7L, 0L)))
  }

  test("intervalCoverage invariants vs a brute-force second-set union") {
    val rnd = new scala.util.Random(7)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq.fill(300)((rnd.nextInt(4).toLong + 1, ts(rnd.nextInt(500).toLong)))
    val ttl = 17L
    val got = EventsOps.intervalCoverage(rows.toDF("user_id", "ts"), ttlSeconds = ttl)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = rows.groupBy(_._1).map { case (u, rs) =>
      val starts = rs.map(_._2.getTime / 1000L)
      val covered = starts.flatMap(t => t until t + ttl).toSet.size.toLong
      u -> (rs.size.toLong, covered, starts.max + ttl - starts.min)
    }
    assert(got == want)
  }

  private def tsAt(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + sec * 1000L) // 2024-01-01 UTC

  test("interArrivalDeciles: gaps in total order, one tile per gap at n=3") {
    val ev = Seq(
      (1L, "x", tsAt(0L)), (2L, "x", tsAt(10L)), (3L, "x", tsAt(30L)),
      (4L, "x", tsAt(100L)), (5L, "solo", tsAt(0L))
    ).toDF("event_id", "event_type", "ts")
    val out = EventsOps.interArrivalDeciles(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // gaps 10, 20, 70 land in tiles 1..3; single-event type emits nothing
    assert(out.toSeq == Seq(
      ("x", 1L, 1L, 10L, 10L), ("x", 2L, 1L, 20L, 20L), ("x", 3L, 1L, 70L, 70L)))
  }

  test("peakConcurrency: overlap peak with earliest time; closes beat opens on ties") {
    val ev = Seq(
      (1L, "x", tsAt(0L)), (2L, "x", tsAt(100L)), (3L, "x", tsAt(600L)),
      (4L, "y", tsAt(0L)), (5L, "y", tsAt(300L)) // touching half-open intervals
    ).toDF("event_id", "event_type", "ts")
    val out = EventsOps.peakConcurrency(ev, ttlSeconds = 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("x", 2L, 1704067200L + 100L), ("y", 1L, 1704067200L)))
  }

  test("duplicateTransactions: same key+value within window flags, others pass") {
    val ev = Seq(
      (1L, 1L, 5.0, tsAt(0L)),
      (2L, 1L, 5.0, tsAt(30L)),   // dup of event 1, gap 30
      (3L, 1L, 5.0, tsAt(200L)),  // 170s after event 2 — outside 60s
      (4L, 1L, 7.0, tsAt(31L)),   // different value
      (5L, 2L, 5.0, tsAt(31L))    // different user
    ).toDF("event_id", "user_id", "value", "ts")
    val out = EventsOps.duplicateTransactions(ev, windowSeconds = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 30L)))
  }

  test("acfByKey: alternating series signs flip per lag; constant and short keys NULL") {
    import spark.implicits._
    def tsAt(s: Long) = new java.sql.Timestamp(s * 1000L)
    // key a: 1,2,1,2,1,2 — centered ±3e6·1e0, D = 54e12;
    //   lag1 = −45/54, lag2 = +36/54, lag3 = −27/54
    val a = (1 to 6).map(i =>
      (i.toLong, "a", if (i % 2 == 1) 1.0 else 2.0, tsAt(i.toLong)))
    // key b: constant → zero variance → NULL acf at every lag
    val b = (1 to 4).map(i => (10L + i, "b", 5.0, tsAt(i.toLong)))
    // key c: 2 values → lag 2 and 3 have n_pairs 0 → NULL
    val c = Seq((21L, "c", 1.0, tsAt(1L)), (22L, "c", 3.0, tsAt(2L)))
    val ev = (a ++ b ++ c).toDF("event_id", "event_type", "value", "ts")
    val out = EventsOps.acfByKey(ev, maxLag = 3, keyCol = "event_type")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      ("a", 1, 5L, Some(-833333L)), ("a", 2, 4L, Some(666666L)),
      ("a", 3, 3L, Some(-500000L)),
      ("b", 1, 3L, None), ("b", 2, 2L, None), ("b", 3, 1L, None),
      ("c", 1, 1L, Some(-500000L)), ("c", 2, 0L, None), ("c", 3, 0L, None)))
  }

  test("acfByKey: blocked rank is boundary-exact — 1-second blocks equal one-block ranks on real data") {
    // forcing a block per second makes every lag pair cross a block
    // boundary; a huge block puts each key in one block (the old
    // single-window shape). Identical output pins the carry arithmetic.
    val ev = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
    val tiny = EventsOps.acfByKey(ev, maxLag = 3, blockMicros = 1000000L)
    val one = EventsOps.acfByKey(ev, maxLag = 3, blockMicros = Long.MaxValue)
    assert(tiny.exceptAll(one).isEmpty && one.exceptAll(tiny).isEmpty)
  }

  test("wilsonInterval: bounds bracket the rate inside [0,1]; certain outcomes stay honest") {
    import spark.implicits._
    // cohort 0: users 0,10 → one converts; cohort 1: user 1 never converts
    val ev = Seq(
      (0L, "purchase"), (0L, "view"), (10L, "view"),
      (1L, "view"), (1L, "click")
    ).toDF("user_id", "event_type")
    val out = EventsOps.wilsonInterval(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val c0 = out.find(_._1 == 0L).get
    assert(c0._2 == 2L && c0._3 == 1L && c0._4 == 500000L)
    assert(c0._5 > 0.0 && c0._5 < 0.5 && c0._6 > 0.5 && c0._6 < 1.0)
    val c1 = out.find(_._1 == 1L).get
    // zero conversions: the lower bound collapses to 0 (within the
    // round-6 grid), the upper does not
    assert(c1._3 == 0L && math.abs(c1._5) <= 1e-6 && c1._6 > 0.0 && c1._6 < 1.0)
  }

  test("trimmedMean: outlier trimmed by exact rank cuts; raw mean rides along") {
    import spark.implicits._
    val ev = ((1 to 10).map(i => (i.toLong, "a", i.toDouble)) :+
      (11L, "a", 1000.0)).toDF("event_id", "event_type", "value")
    val out = EventsOps.trimmedMean(ev, trimPpm = 100000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // n=11, cut=1: drop value 1 and value 1000, keep 2..10 → mean 6
    assert(out.toSeq == Seq(("a", 11L, 9L, 95909090L, 6000000L)))
  }

  test("mannWhitneyU: hand-computed tie-average ranks, U halves, z") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 1.0), (2L, "view", 2.0), (3L, "view", 2.0),
      (11L, "purchase", 2.0), (12L, "purchase", 3.0)
    ).toDF("event_id", "event_type", "value")
    val r = EventsOps.mannWhitneyU(ev, "view", "purchase").collect().head
    // ranks over {1, 2,2,2, 3}: R_view = 1 + 3 + 3 = 7 → 2U_a = 14 − 12 = 2
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((3L, 2L, 2L, 10L)))
    // z = (1 − 3)/sqrt(0.5·(6 − 24/20)) = −1.291 at round-3
    assert(r.getDouble(6) == -1.291)
  }

  test("quantileNormalize: rank-matched values; extremes map to extremes") {
    import spark.implicits._
    // A = click values 10,20,30,40 (n=4); B = purchase values 1,2,3 (n=3)
    // mid-rank pcts 1/8,3/8,5/8,7/8 → ceil(pct·3) = 1,2,2,3
    val ev = Seq(
      (1L, "click", 10.0), (2L, "click", 20.0), (3L, "click", 30.0), (4L, "click", 40.0),
      (11L, "purchase", 1.0), (12L, "purchase", 2.0), (13L, "purchase", 3.0)
    ).toDF("event_id", "event_type", "value")
    val out = EventsOps.quantileNormalize(ev, "click", "purchase")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 10000000L, 1000000L), (2L, 20000000L, 2000000L),
      (3L, 30000000L, 2000000L), (4L, 40000000L, 3000000L)))
  }

  test("activityStreaks: islands over distinct days; same-day repeats collapse") {
    import spark.implicits._
    def atDay(d: Long, s: Int) = new java.sql.Timestamp((d * 86400L + s) * 1000L)
    val ev = Seq(
      (1L, 1L, atDay(10, 1)), (2L, 1L, atDay(10, 2)), // same day ×2
      (3L, 1L, atDay(11, 1)), (4L, 1L, atDay(12, 1)), // 10-12 = streak of 3
      (5L, 1L, atDay(20, 1)),                         // isolated day
      (6L, 2L, atDay(5, 1))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.activityStreaks(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L, 3L, 2L), (2L, 1L, 1L, 1L)))
  }

  test("wowGrowth: dense weeks, signed ppm, zero base and first week NULL") {
    import spark.implicits._
    def atWeek(w: Long, i: Int) = new java.sql.Timestamp((w * 7L * 86400L + i) * 1000L)
    val ev =
      (1 to 4).map(i => (i.toLong, "a", atWeek(0, i))) ++  // week 0: 4
        (1 to 2).map(i => (10L + i, "a", atWeek(1, i))) ++ // week 1: 2 (−50%)
        Seq((20L, "a", atWeek(3, 1)))                      // week 2 silent, week 3: 1
    val out = EventsOps.wowGrowth(ev.toDF("event_id", "event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      ("a", 0L, 4L, None),               // no base week
      ("a", 1L, 2L, Some(-500000L)),     // halved
      ("a", 2L, 0L, Some(-1000000L)),    // silent week is a real −100%
      ("a", 3L, 1L, None)))              // zero base → NULL
  }

  test("seasonalProfile: slots fold mod 168, index scales share by 168") {
    import spark.implicits._
    def atHour(h: Long, i: Int) = new java.sql.Timestamp((h * 3600L + i) * 1000L)
    val ev = Seq(
      (1L, "a", atHour(0, 1)), (2L, "a", atHour(0, 2)), // slot 0 ×2
      (3L, "a", atHour(1, 1)),                          // slot 1
      (4L, "a", atHour(169, 1))                         // next week's hour 1 → slot 1
    ).toDF("event_id", "event_type", "ts")
    val out = EventsOps.seasonalProfile(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both slots hold half the volume → index = 0.5 · 168 = 84×
    assert(out.toSeq == Seq(("a", 0L, 2L, 84000000L), ("a", 1L, 2L, 84000000L)))
  }

  test("seasonalNaiveMase: zero-filled grid, both lags, hand-computed SAE ratio") {
    import spark.implicits._
    def atHour(h: Long, i: Int) = new java.sql.Timestamp((h * 3600L + i) * 1000L)
    val ev =
      (1 to 2).map(i => (i.toLong, "a", atHour(0, i))) ++      // c_0 = 2
        (1 to 5).map(i => (10L + i, "a", atHour(168, i))) ++   // c_168 = 5
        (1 to 3).map(i => (20L + i, "a", atHour(170, i)))      // c_170 = 3 (169 empty)
    val out = EventsOps.seasonalNaiveMase(ev.toDF("event_id", "event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // eval hours 168..170: seasonal errors |5−2|+|0−0|+|3−0| = 6;
    // naive errors |5−0|+|0−5|+|3−0| = 13
    assert(out.toSeq == Seq(("a", 3L, 6L, 13L, Some(461538L))))
  }

  test("lorenzDeciles: asc spend buckets, cumulative shares, top bucket exactly 1e6") {
    import spark.implicits._
    val ev = Seq(
      (1L, "x", 0.5), (1L, "x", 0.5), // user 1 totals 1.0
      (2L, "x", 2.0), (3L, "x", 3.0), (4L, "x", 4.0)
    ).toDF("user_id", "event_type", "value")
    val out = EventsOps.lorenzDeciles(ev, buckets = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // bottom bucket = users 1,2 (3e6 of 10e6 → 30%); top cumulative = 100%
    assert(out.toSeq == Seq(
      ("x", 1, 2L, 3000000L, 300000L), ("x", 2, 2L, 7000000L, 1000000L)))
  }

  test("markovNext: per-from argmax with asc tie-break, exact hit rates") {
    import spark.implicits._
    def tsAt(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1: view→click→view→purchase
      (1L, 1L, "view", tsAt(1)), (2L, 1L, "click", tsAt(2)),
      (3L, 1L, "view", tsAt(3)), (4L, 1L, "purchase", tsAt(4)),
      // user 2: view→click
      (5L, 2L, "view", tsAt(1)), (6L, 2L, "click", tsAt(2)),
      // user 3: click→purchase — ties click's next {view:1, purchase:1}
      (7L, 3L, "click", tsAt(1)), (8L, 3L, "purchase", tsAt(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.markovNext(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("click", "purchase", 2L, 1L, 500000L), // tie broken to the asc type
      ("view", "click", 3L, 2L, 666666L)))
  }

  test("typeEntropy: uniform mix sums quantized terms; single-type user is zero") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"), (1L, "click"),
      (2L, "view"), (2L, "view"), (2L, "view")
    ).toDF("user_id", "event_type")
    val out = EventsOps.typeEntropy(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 1: two p=0.5 terms, each floor(0.34657359…·1e6) = 346573
    assert(out.toSeq == Seq((1L, 4L, 2L, 693146L), (2L, 3L, 1L, 0L)))
  }

  test("crossCorrelation: planted one-hour lead is exactly 1.0 at lag +1") {
    import spark.implicits._
    def at(h: Int, i: Int) = new java.sql.Timestamp((h * 3600L + i) * 1000L)
    val views = for (h <- 0 to 3; i <- 1 to (h + 1))
      yield ((h * 10 + i).toLong, "view", at(h, i))
    // purchase volume = view volume one hour EARLIER, plus an off-trend
    // hour 0 so lag 0 is NOT also perfectly linear
    val purch = (for (h <- 1 to 3; i <- 1 to h)
      yield ((1000 + h * 10 + i).toLong, "purchase", at(h, i))) ++
      Seq((2000L, "purchase", at(0, 1)), (2001L, "purchase", at(0, 2)),
        (2002L, "purchase", at(0, 3)), (2003L, "purchase", at(0, 4)),
        (2004L, "purchase", at(0, 5)))
    val ev = (views ++ purch).toDF("event_id", "event_type", "ts")
    val byLag = EventsOps.crossCorrelation(ev, maxLag = 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    // dense grid is hours 0..3 → pair counts 4, 3, 2 by |lag|
    assert(byLag(0)._1 == 4L && byLag(1)._1 == 3L && byLag(-2)._1 == 2L)
    // a leads b by one hour: views at h are purchases at h+1 exactly
    assert(byLag(1)._2.contains(1.0))
    assert(!byLag(0)._2.contains(1.0))
  }

  test("twap: hold-until-next weighting, burst convention, singleton NULL") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // "a": 10 held 10s, 20 held 20s, 30 unheld → twap 500e6/30
      (1L, "a", at(0), 10.0), (2L, "a", at(10), 20.0), (3L, "a", at(30), 30.0),
      // "b": single event → no held time → twap NULL, mean = value
      (4L, "b", at(5), 7.0),
      // "c": same-second burst — only the LAST event of the second
      // carries the hold (ids order the burst)
      (5L, "c", at(5), 1.0), (6L, "c", at(5), 9.0), (7L, "c", at(15), 9.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventsOps.twap(ev).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(out.toSeq == Seq(
      ("a", 3L, 30L, 30L, 20000000L, Some(16666666L)),
      ("b", 1L, 0L, 0L, 7000000L, None),
      ("c", 3L, 10L, 10L, 6333333L, Some(9000000L))))
  }

  test("ohlcBars: open/close from the (sec, tie) total order, per-bar stats") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, "a", at(1), 5.0), (2L, "a", at(3), 8.0),   // bar 0
      (3L, "a", at(12), 2.0),                         // bar 1
      // same-second open tie broken by event_id: id 4 is the open
      (4L, "b", at(20), 3.0), (5L, "b", at(20), 4.0)  // bar 2
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventsOps.ohlcBars(ev, barSeconds = 10L)
      .orderBy("event_type", "bar").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(out.toSeq == Seq(
      ("a", 0L, 0L, 2L, 5000000L, 8000000L, 5000000L, 8000000L, 13000000L),
      ("a", 1L, 10L, 1L, 2000000L, 2000000L, 2000000L, 2000000L, 2000000L),
      ("b", 2L, 20L, 2L, 3000000L, 4000000L, 3000000L, 4000000L, 7000000L)))
  }

  test("heavyChangers: midpoint split, |delta| ranking, key tie-break") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // range 0..100 → mid 50; midpoint event counts as BEFORE (s <= mid)
    val ev = Seq(
      (1L, 1L, at(0)), (2L, 1L, at(0)), (3L, 1L, at(100)),  // 2 before, 1 after
      (4L, 2L, at(60)), (5L, 2L, at(80)),                   // 0 before, 2 after
      (6L, 3L, at(50))                                      // exactly mid → before
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.heavyChangers(ev, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 2 leads at |delta| 2; users 1 and 3 tie at 1 → key asc picks 1
    assert(out.toSeq == Seq((2L, 0L, 2L, 2L), (1L, 2L, 1L, -1L)))
  }

  test("positionAttribution: U-shaped credits, remainder rule, exact 1e6 per conversion") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1 journey 0: view,click,view → 400k + 200k + 400k
      (1L, 1L, "view", at(1)), (2L, 1L, "click", at(2)), (3L, 1L, "view", at(3)),
      (4L, 1L, "purchase", at(4)),
      // user 1 journey 1: single view → 1e6
      (5L, 1L, "view", at(5)), (6L, 1L, "purchase", at(6)),
      // user 2: conversion with no touches → direct 1e6
      (7L, 2L, "purchase", at(1)),
      // user 3: touch with no conversion → dropped entirely
      (8L, 3L, "view", at(9)),
      // user 4: five views → 400k + (66666+2) + 66666 + 66666 + 400k = 1e6
      (9L, 4L, "view", at(1)), (10L, 4L, "view", at(2)), (11L, 4L, "view", at(3)),
      (12L, 4L, "view", at(4)), (13L, 4L, "view", at(5)),
      (14L, 4L, "purchase", at(6))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.positionAttribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("view", 8L, 2800000L), ("direct", 1L, 1000000L), ("click", 1L, 200000L)))
    // the invariant the remainder rule exists for: 4 conversions → 4e6
    assert(out.map(_._3).sum == 4000000L)
  }

  test("weightedMedian: heavy row outvotes, lower-median convention, weight filter") {
    val ev = Seq(
      // "a": cum weights 1,3,4 of 4 → first 2·cum ≥ tot at v=2
      (1L, "a", 1.0, 1L), (2L, "a", 2.0, 2L), (3L, "a", 3.0, 1L),
      // "b": even split → LOWER median (v=1)
      (4L, "b", 1.0, 1L), (5L, "b", 2.0, 1L),
      // "c": only non-positive weights → key absent
      (6L, "c", 5.0, 0L), (7L, "c", 6.0, -2L)
    ).toDF("event_id", "event_type", "value", "weight")
    val out = EventsOps.weightedMedian(ev).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 4L, 2000000L), ("b", 2L, 2L, 1000000L)))
  }

  test("ratioMetricCI: degenerate and varying cohorts, independent float path") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // cohort 0 = users 0, 2: user 0 → (1 purchase, 2 views); user 2 →
    // (0, 2). cohort 1 = user 1 alone → n < 2 → NULL CI.
    val ev = Seq(
      (1L, 0L, "purchase", at(1)), (2L, 0L, "view", at(2)), (3L, 0L, "view", at(3)),
      (4L, 2L, "view", at(4)), (5L, 2L, "view", at(5)),
      (6L, 1L, "view", at(6)), (7L, 1L, "error", at(7))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.ratioMetricCI(ev, nCohorts = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    // cohort 0: R = 1/4; independent re-derivation of the declared se:
    // Vx = 2·1−1 = 1, Cxy = 2·2−1·4 = 0, Vy = 2·8−16 = 0 →
    // se = sqrt(1/1)/4 = 0.25 → ci_lo = 0.25 − 1.96·0.25 = −0.24
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 4L, Some(0.25), Some(-0.24)),
      (1L, 1L, 0L, 1L, Some(0.0), None)))
  }

  test("mixShift: planted mix move, effects reconcile the declared identity") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // before (s ≤ 50): 2 a-events at 1.0, 2 b-events at 3.0
    // after: 3 a-events at 1.0, 1 b-event at 5.0 — a's share grew,
    // b's rate grew
    val ev = Seq(
      (1L, "a", 1.0, at(0)), (2L, "a", 1.0, at(1)),
      (3L, "b", 3.0, at(2)), (4L, "b", 3.0, at(3)),
      (5L, "a", 1.0, at(97)), (6L, "a", 1.0, at(98)), (7L, "a", 1.0, at(99)),
      (8L, "b", 5.0, at(100))
    ).toDF("event_id", "event_type", "value", "ts")
    val out = EventsOps.mixShift(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(out.toSeq == Seq(
      // a: share 500000→750000 at rate 1e6 → mix +250000, rate 0
      ("a", 2L, 3L, 500000L, 750000L, 1000000L, 1000000L, 250000L, 0L),
      // b: share 500000→250000 at rate 3e6 → mix −750000; rate
      // (5e6−3e6)·250000/1e6 = +500000
      ("b", 2L, 1L, 500000L, 250000L, 3000000L, 5000000L, -750000L, 500000L)))
  }

  test("slaPercentiles: exact lower-percentile ranks on a 100-value ladder") {
    // values 1..100 → rank ceil(p·100/100) = p exactly: p50 = 50, p99 = 99
    val ev = (1 to 100).map(i => (i.toLong, "g", i.toDouble)) :+ ((200L, "tiny", 7.0))
    val out = EventsOps.slaPercentiles(ev.toDF("event_id", "event_type", "value"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("g", 100L, 50000000L, 90000000L, 95000000L, 99000000L),
      // n = 1: every percentile is the single value (ceil(p/100) = 1)
      ("tiny", 1L, 7000000L, 7000000L, 7000000L, 7000000L)))
  }

  test("decayScore: exact halving per half-life of age at the high-water mark") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val day = 86400L
    val ev = Seq(
      (1L, at(0), 4.0),        // 2 half-lives old → 4e6 / 4 = 1e6
      (1L, at(day), 4.0),      // 1 half-life → 2e6
      (2L, at(2 * day), 1.0)   // sets hwm; age 0 → full 1e6
    ).toDF("user_id", "ts", "value")
    val out = EventsOps.decayScore(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3000000L, day), (2L, 1L, 1000000L, 2 * day)))
  }

  test("woeIv: hand-computed smoothed WOE/IV on a 2-bucket split") {
    val ev = Seq(
      (1L, "view", 1.0), (2L, "view", 2.0),
      (3L, "purchase", 3.0), (4L, "purchase", 4.0)
    ).toDF("event_id", "event_type", "value")
    val out = EventsOps.woeIv(ev, nBuckets = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // smoothing (2n+1)/(2N+k): low bucket ln((1·6)/(5·6)) = −ln 5
    assert(out.toSeq == Seq(
      (1, 2L, 0L, 2L, -1.609438, 1.072959, 2.145918),
      (2, 2L, 2L, 0L, 1.609438, 1.072959, 2.145918)))
  }

  test("burstiness: dense-grid Fano with silent hours as real zeros") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // "p": hours 0,0,0 and 2 → grid (3,0,1): F = (3·10−16)/(2·4)
      (1L, "p", at(10)), (2L, "p", at(20)), (3L, "p", at(30)),
      (4L, "p", at(2 * 3600 + 5)),
      (5L, "q", at(100))  // single hour → NULL
    ).toDF("event_id", "event_type", "ts")
    val out = EventsOps.burstiness(ev).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      ("p", 3L, 4L, Some(1750000L)), ("q", 1L, 1L, None)))
  }

  test("diffInDiff: removes baseline and common trend exactly") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, "purchase", 2.0, at(0)), (2L, "purchase", 5.0, at(100)),
      (3L, "view", 1.0, at(0)), (4L, "view", 3.0, at(100))
    ).toDF("event_id", "event_type", "value", "ts")
    val r = EventsOps.diffInDiff(ev).collect().head
    // treated +3, control +2 → DiD = +1
    assert(r.getLong(8) == 1000000L)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 1L)))
    assert(r.getLong(5) - r.getLong(4) == 3000000L)
  }

  test("qqTable: doubled distribution reads as a constant 0.5 ratio") {
    val ev = ((1 to 10).map(i => (i.toLong, "view", i.toDouble)) ++
      (1 to 10).map(i => (100L + i, "purchase", 2.0 * i))
    ).toDF("event_id", "event_type", "value")
    val out = EventsOps.qqTable(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == (1 to 10).map(d =>
      (d, d * 1000000L, 2L * d * 1000000L, 500000L)))
  }

  test("cumulativeUniques: first-seen decomposition with dense silent days") {
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val ev = Seq(
      (1L, 10L, at(0)), (2L, 11L, at(0)),   // day 0: users 10, 11
      (3L, 10L, at(1)),                     // day 1: only a RETURNING user
      // day 2 silent; day 3: one new, one returning
      (4L, 12L, at(3)), (5L, 11L, at(3))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.cumulativeUniques(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L), (1L, 0L, 2L), (2L, 0L, 2L), (3L, 1L, 3L)))
  }

  test("sessionKpis: bounce accounting and exact means over the session table") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: one 3-event session lasting 100s, then a bounce later
      (1L, 1L, at(0)), (2L, 1L, at(50)), (3L, 1L, at(100)),
      (4L, 1L, at(10000)),
      // user 2: a single bounce
      (5L, 2L, at(500))
    ).toDF("event_id", "user_id", "ts")
    val r = EventsOps.sessionKpis(ev, gapSeconds = 1800L).collect().head
    // 3 sessions, 2 bounces; events/session = 5/3; mean duration 100/3
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 2L, 666666L, 1666666L, 33333333L)))
  }

  test("sloBurn: budget crosses zero exactly when the SLO is burned") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // hour 0: 1 error in 100 (1% — exactly on a 99% SLO);
    // hour 1: 3 errors in 100 → cumulative 2% → budget −10000
    val h0 = (1 to 99).map(i => (i.toLong, "view", at(i))) :+ ((100L, "error", at(100)))
    val h1 = (1 to 97).map(i => (200L + i, "view", at(3600 + i))) ++
      Seq((301L, "error", at(3700)), (302L, "error", at(3701)), (303L, "error", at(3702)))
    val out = EventsOps.sloBurn((h0 ++ h1).toDF("event_id", "event_type", "ts"),
        sloPpm = 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 10000L, 10000L, 0L),      // exactly on budget
      (1L, 30000L, 20000L, -10000L)  // burned: sign flips
    ))
  }

  test("cuped: perfectly-correlated pre/post gives rho 1 and full reduction") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // midpoint of [0, 100] = 50; per user: post = 2 × pre exactly
    val ev = Seq(
      (1L, 1L, at(0), 1.0), (2L, 1L, at(100), 2.0),
      (3L, 2L, at(0), 2.0), (4L, 2L, at(100), 4.0),
      (5L, 3L, at(0), 3.0), (6L, 3L, at(100), 6.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = EventsOps.cuped(ev).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 2.0)      // theta = cov/varX = 2
    assert(r.getDouble(2) == 1.0)      // rho = 1
    assert(r.getLong(3) == 1000000L)   // full variance elimination
  }

  test("cuped: zero pre-period variance yields NULL adjustments") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, at(0), 5.0), (2L, 1L, at(100), 1.0),
      (3L, 2L, at(0), 5.0), (4L, 2L, at(100), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = EventsOps.cuped(ev).collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("seasonalOutliers: the burst cell tops the deviation ranking") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // slot 0 in weeks 0..2: counts 1, 1, 10 → week 2 index 2.5e6
    val ev = (Seq((1L, at(0)), (2L, at(168L * 3600))) ++
      (1 to 10).map(i => (10L + i, at(2 * 168L * 3600 + i)))
    ).toDF("event_id", "ts")
    val out = EventsOps.seasonalOutliers(ev, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    // hour_of_week 0 has 12 events over 3 weeks → burst week index
    // = 10·3·1e6/12 = 2.5e6, deviation 1.5e6 — the top row
    assert(out.head == ((0L, 2L, 10L, 2500000L, 1500000L)))
  }

  test("maxDrawdown: hand-walked peak-to-trough ladder") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // cumulative: 5, 8, 2, 4, 9 → peaks 5, 8, 8, 8, 9 → drawdowns
    // 0, 0, 6, 4, 0 → max 6; final 9, peak 9
    val ev = Seq(
      (1L, 1L, at(1), 5.0), (2L, 1L, at(2), 3.0), (3L, 1L, at(3), -6.0),
      (4L, 1L, at(4), 2.0), (5L, 1L, at(5), 5.0),
      // user 2: monotone rise → zero drawdown
      (6L, 2L, at(1), 1.0), (7L, 2L, at(2), 1.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.maxDrawdown(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, 9000000L, 9000000L, 6000000L),
      (2L, 2L, 2000000L, 2000000L, 0L)))
  }

  test("effectSize: hand-computed d and planning n on a clean two-sample") {
    // A: 1,2,3 (mean 2); B: 5,6,7 (mean 6); pooled s² = (2+2)/4 = 1
    // → d = −4; n = ceil(2·(2.801585)²·1/16) = ceil(0.98...) = 1
    val ev = Seq(
      (1L, "view", 1.0), (2L, "view", 2.0), (3L, "view", 3.0),
      (4L, "purchase", 5.0), (5L, "purchase", 6.0), (6L, "purchase", 7.0)
    ).toDF("event_id", "event_type", "value")
    val r = EventsOps.effectSize(ev).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert((r.getLong(2), r.getLong(3)) == ((2000000L, 6000000L)))
    // NOTE micro scaling: s in micro too, d is scale-free = −4
    assert(r.getDouble(4) == -4.0)
    assert(r.getLong(5) == 1L)
    // degenerate: identical values → NULL d and n
    val flat = Seq((1L, "view", 2.0), (2L, "view", 2.0),
      (3L, "purchase", 2.0), (4L, "purchase", 2.0))
      .toDF("event_id", "event_type", "value")
    val f = EventsOps.effectSize(flat).collect().head
    assert(f.isNullAt(4) && f.isNullAt(5))
  }

  test("cChart: only the burst hour trips the integer control test") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // hours 0..3 with counts 4, 4, 4, 20 → c̄ = 8, 3√c̄ ≈ 8.49:
    // |4−8| < 8.49 in-control, |20−8| = 12 > 8.49 out of control
    val ev = (
      (1 to 4).map(i => (i.toLong, at(i))) ++
      (1 to 4).map(i => (10L + i, at(3600 + i))) ++
      (1 to 4).map(i => (20L + i, at(7200 + i))) ++
      (1 to 20).map(i => (30L + i, at(10800 + i)))
    ).toDF("event_id", "ts")
    val out = EventsOps.cChart(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, false), (1L, 4L, false), (2L, 4L, false), (3L, 20L, true)))
  }

  test("cohortLtv: first-seen cohorts, curve accumulates by age") {
    def at(week: Long, off: Long = 0L) =
      new java.sql.Timestamp((week * 604800L + off) * 1000L)
    val ev = Seq(
      // user 1 joins week 0, spends 1.0 then 2.0 a week later
      (1L, 1L, at(0), 1.0), (2L, 1L, at(1), 2.0),
      // user 2 also week-0 cohort
      (3L, 2L, at(0, 60), 5.0),
      // user 3 joins week 1, single spend
      (4L, 3L, at(1, 60), 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 6000000L, 6000000L),
      (0L, 1L, 2L, 2000000L, 8000000L),
      (1L, 0L, 1L, 7000000L, 7000000L)))
  }

  test("conformalInterval: exact rank-cut residual quantile brackets the data") {
    // values 1..10 (mean = 55/10 = 5.5 → micro 5500000); residuals
    // |v−5.5| sorted (micro): 5e5,5e5,15e5,15e5,25e5,25e5,35e5,35e5,
    // 45e5,45e5 → ceiling rank least(10, ⌈11·90/100⌉ = 10) → 10th =
    // 4500000 (tied with the 9th here; the distinct-residual test
    // below pins the floor-vs-ceil difference)
    val ev = (1 to 10).map(i => (i.toLong, "g", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = EventsOps.conformalInterval(ev).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((10L, 5500000L, 4500000L)))
    assert((r.getLong(4), r.getLong(5)) == ((1000000L, 10000000L)))
    // coverage property: at least 90% of the points fall inside
    val inside = (1 to 10).count(i => i * 1000000L >= r.getLong(4) &&
      i * 1000000L <= r.getLong(5))
    assert(inside >= 9)
  }

  test("timeInState: hold-until-next shares, singleton user NULL") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: view holds 30s, click holds 70s, purchase holds 0
      (1L, 1L, "view", at(0)), (2L, 1L, "click", at(30)),
      (3L, 1L, "purchase", at(100)),
      // user 2: single event → zero span → NULL share
      (4L, 2L, "view", at(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.timeInState(ev).orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.toSeq == Seq(
      (1L, "click", 70L, Some(700000L)),
      (1L, "purchase", 0L, Some(0L)),
      (1L, "view", 30L, Some(300000L)),
      (2L, "view", 0L, None)))
  }

  test("markovStationary: absorbing state gathers the mass; sinks keep theirs") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // chain a→b, b→b (absorbing): after 3 iters from (500000, 500000)
    // all of a's mass has flowed into b
    val ev = Seq(
      (1L, 1L, "a", at(0)), (2L, 1L, "b", at(1)),
      (3L, 1L, "b", at(2)), (4L, 1L, "b", at(3))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.markovStationary(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 500000L, 0L), ("b", 2L, 500000L, 1000000L)))
    // a pure sink with no outgoing transitions keeps its mass
    val ev2 = Seq((1L, 1L, "x", at(0)), (2L, 2L, "y", at(0)),
      (3L, 2L, "y", at(1))).toDF("event_id", "user_id", "event_type", "ts")
    val out2 = EventsOps.markovStationary(ev2).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    // x has no transitions (singleton user) → keeps its 500000
    assert(out2("x") == 500000L && out2("y") == 500000L)
  }

  test("lagFeatures: strictly backward lags and trailing mean") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, at(1), 1.0), (2L, 1L, at(2), 2.0), (3L, 1L, at(3), 4.0),
      (4L, 1L, at(4), 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventsOps.lagFeatures(ev).orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, None, None, 1000000L),
      (2L, Some(1000000L), None, 1500000L),
      (3L, Some(2000000L), Some(1000000L), 2333333L),
      (4L, Some(4000000L), Some(2000000L), 4666666L)))
  }

  test("horizonLabels: in-horizon positive, same-second excluded, tail censored") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val day = 86400L
    val ev = Seq(
      (1L, 1L, "view", at(0)),            // purchase at 100 → label
      (2L, 1L, "purchase", at(100)),      // next purchase 2 days out → no
      (3L, 1L, "view", at(150)),          // purchase at 2·day+150 is > day away → no
      (4L, 1L, "purchase", at(2 * day + 150)),
      // user 2: purchase in the SAME second as the view → no label
      (5L, 2L, "view", at(500)), (6L, 2L, "purchase", at(500))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.horizonLabels(ev).orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4)))
    // hwm = 2·day+150; censored ⇔ hwm − sec < day
    assert(out.toSeq == Seq(
      (1L, true, false), (2L, false, false), (3L, false, false),
      (4L, false, true), (5L, false, false), (6L, false, false)))
  }

  test("milestoneVelocity: exact lower-median ladder from first contact") {
    def at(day: Long, i: Long) = new java.sql.Timestamp((day * 86400L + i) * 1000L)
    val ev = Seq(
      // u1: first contact day 0 (view), purchases on days 2 and 5
      (1L, 1L, "view", at(0, 1)),
      (2L, 1L, "purchase", at(2, 1)), (3L, 1L, "purchase", at(5, 1)),
      // u2: first contact IS the purchase → milestone 1 at 0 days
      (4L, 2L, "purchase", at(3, 1)),
      // u3: purchases days 1, 2, 3, 4 after contact day 0 — milestone 4
      // falls past maxMilestone
      (5L, 3L, "view", at(0, 1)), (6L, 3L, "purchase", at(1, 1)),
      (7L, 3L, "purchase", at(2, 1)), (8L, 3L, "purchase", at(3, 1)),
      (9L, 3L, "purchase", at(4, 1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.milestoneVelocity(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // m1 days {2, 0, 1} → median 1, max 2; m2 {5, 2} → lower median 2
      (1L, 3L, 1L, 2L), (2L, 2L, 2L, 5L), (3L, 1L, 3L, 3L)))
  }

  test("churnDefinitionSweep: returned gaps vs censored silence split by threshold") {
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val ev = Seq(
      // u1: 10-day internal gap, then returns — history contradicts churn
      (1L, 1L, "view", at(0)), (2L, 1L, "view", at(10)),
      // u2: one visit at day 5 → 5-day final silence vs hwm 10
      (3L, 2L, "view", at(5)),
      // u3: tight activity, never flagged
      (4L, 3L, "view", at(8)), (5L, 3L, "view", at(10))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.churnDefinitionSweep(ev, thresholdsDays = Seq(3L, 7L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (3L, 3L, 2L, 1L, 500000L),    // u1 + u2 flagged, only u1 returned
      (7L, 3L, 1L, 1L, 1000000L)))  // at 7 days the definition is pure noise
  }

  test("chainEntropy: fair-coin state reads 1000 millibits, corridors read 0") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // one user walks A,B,A,C,A,B,A,C → A splits 50/50, B and C corridor
    val seqTypes = Seq("A", "B", "A", "C", "A", "B", "A", "C")
    val ev = seqTypes.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, t, at(i * 10L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.chainEntropy(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("A", 4L, 2L, 1000L), ("B", 2L, 1L, 0L), ("C", 1L, 1L, 0L)))
  }

  test("interruptedSeries: hand-fit slopes and the level jump at the break") {
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val ev = Seq(
      // pre (days 0-1): 10 → 20, slope +10/day, line hits 30 at the break
      (1L, 1L, "view", 10.0, at(0)), (2L, 1L, "view", 20.0, at(1)),
      // post (days 2-3): 50 → 40, slope −10/day, level 50 at the break
      (3L, 1L, "view", 50.0, at(2)), (4L, 1L, "view", 40.0, at(3))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = EventsOps.interruptedSeries(ev, breakAfterDays = 2L).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 10000000000000L && r.getLong(3) == -10000000000000L)
    assert(r.getLong(4) == -20000000000000L)
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((30000000L, 50000000L, 20000000L)))
  }

  test("dispersionIndex: constant days score 0, a burst inflates var/mean, thin types drop") {
    def at(day: Long, i: Long) = new java.sql.Timestamp((day * 86400L + i) * 1000L)
    val rows =
      (0L until 5L).flatMap(d => Seq(("a", d, 1L), ("a", d, 2L))) ++   // 2/day
      (0L until 4L).map(d => ("b", d, 1L)) ++ Seq(("b", 4L, 1L), ("b", 4L, 2L),
        ("b", 4L, 3L), ("b", 4L, 4L), ("b", 4L, 5L), ("b", 4L, 6L)) ++ // 1,1,1,1,6
      (0L until 4L).map(d => ("c", d, 1L))                             // 4 days only
    val ev = rows.zipWithIndex.map { case ((t, d, i), ix) =>
      (ix.toLong, 1L, t, at(d, i))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.dispersionIndex(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // b: n=5, Σ=10, Σc²=40 → (200−100)·1e6/50 = 2e6
    assert(out.toSeq == Seq(("a", 5L, 10L, 0L), ("b", 5L, 10L, 2000000L)))
  }

  test("purchaseRegularity: clockwork scores CV 0, irregular buyer exact isqrt CV, thin users drop") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // u1: exact 100-second clock → CV 0, regular
      (1L, 1L, "purchase", at(0)), (2L, 1L, "purchase", at(100)),
      (3L, 1L, "purchase", at(200)), (4L, 1L, "purchase", at(300)),
      // u2: gaps 100/300/600 → var 63333, sd 251, cv 753753 → variable
      (5L, 2L, "purchase", at(0)), (6L, 2L, "purchase", at(100)),
      (7L, 2L, "purchase", at(400)), (8L, 2L, "purchase", at(1000)),
      // u3: only 2 purchases (1 gap) → below minGaps
      (9L, 3L, "purchase", at(0)), (10L, 3L, "purchase", at(50)),
      // non-purchase noise never enters
      (11L, 1L, "view", at(150))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.purchaseRegularity(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (1L, 3L, 100L, 0L, 0L, "regular"),
      (2L, 3L, 333L, 251L, 753753L, "variable")))
  }

  test("markovAttribution: hand-traced removal effects on a 3-user journey graph") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, "view", at(10)), (2L, 1L, "purchase", at(20)),
      (3L, 2L, "view", at(10)), (4L, 2L, "click", at(20)), (5L, 2L, "purchase", at(30)),
      (6L, 3L, "click", at(10)),
      // post-conversion activity is cut from the journey
      (7L, 1L, "view", at(99))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.markovAttribution(ev, channels = Seq("view", "click"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // base: conv = 333333 + 166666 + 166666 = 666665 ppm (truncating
    // rounds); removing view leaves only the START→click path (166666);
    // removing click keeps the direct view→purchase path (333333)
    assert(out.toSeq == Seq(
      ("click", 666665L, 333333L, 499999L),
      ("view", 666665L, 166666L, 750000L)))
  }

  test("calibrationBacktest: out-of-time gap per bucket, thin train buckets and eval-only buckets drop") {
    def at(day: Long, i: Long) = new java.sql.Timestamp((day * 86400L + i) * 1000L)
    val ev = Seq(
      // day 0 (train, trainDays = 1): bucket 0 → 4 rows, 2 purchases
      (1L, 1L, "purchase", 5.0, at(0, 1)), (2L, 1L, "view", 5.0, at(0, 2)),
      (3L, 2L, "purchase", 6.0, at(0, 3)), (4L, 2L, "view", 7.0, at(0, 4)),
      // day 0: bucket 1 has only one train row → below minTrainN, drops
      (5L, 3L, "purchase", 15.0, at(0, 5)),
      // day 1 (eval): bucket 0 → 2 rows, 0 purchases; bucket 2 eval-only
      (6L, 1L, "view", 5.0, at(1, 1)), (7L, 2L, "view", 8.0, at(1, 2)),
      (8L, 3L, "view", 25.0, at(1, 3))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = EventsOps.calibrationBacktest(ev, trainDays = 1L, minTrainN = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // train rate 500000 ppm vs eval 0 → gap = ece = 500000
    assert(out.toSeq == Seq((0L, 4L, 500000L, 2L, 0L, 500000L, 500000L)))
  }

  test("growthAccounting: flows reconcile and a gap day churns then resurrects") {
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val ev = Seq(
      // u1: active d0, d1, d3 (skips d2 → churns into d2, resurrects d3)
      (1L, 1L, "view", at(0)), (2L, 1L, "view", at(1)), (3L, 1L, "view", at(3)),
      // u2: active d0 only (churns into d1)
      (4L, 2L, "view", at(0)),
      // u3: first seen d1, active d1 and d2
      (5L, 3L, "view", at(1)), (6L, 3L, "view", at(2)),
      // duplicate same-day events fold in the distinct
      (7L, 1L, "click", at(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.growthAccounting(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // day, active, new, retained, resurrected, churned
      (0L, 2L, 2L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 1L),   // u3 new, u1 retained; u2 churned
      (2L, 1L, 0L, 1L, 0L, 1L),   // u3 retained; u1 churned into d2
      (3L, 1L, 0L, 0L, 1L, 1L)))  // u1 resurrects; u3 churned
    // identity: active = new + retained + resurrected on every row
    assert(out.forall(r => r._2 == r._3 + r._4 + r._5))
  }
}

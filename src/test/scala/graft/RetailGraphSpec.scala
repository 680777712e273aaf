package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventsOps, Graph, Retail}

/** Hand-computed fixtures for the round-9 analytics ops: ordered
  * funnel, last-touch attribution, basket lift, RFM segmentation and
  * fixed-point PageRank. */
class RetailGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnelSteps: strictly-later chaining and ppm vs step-1 cohort") {
    // u1: view@1 click@2 purchase@3 → completes all three.
    // u2: click@1 view@2 click@5 purchase@4 → view@2, later click@5,
    //     but no purchase after 5 → stops at step 2.
    // u3: view@1 only → stops at step 1.
    // u4: click@1 purchase@2, no view → never enters.
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:01"),
      (2L, 1L, "click", "2024-01-01 00:00:02"),
      (3L, 1L, "purchase", "2024-01-01 00:00:03"),
      (4L, 2L, "click", "2024-01-01 00:00:01"),
      (5L, 2L, "view", "2024-01-01 00:00:02"),
      (6L, 2L, "purchase", "2024-01-01 00:00:04"),
      (7L, 2L, "click", "2024-01-01 00:00:05"),
      (8L, 3L, "view", "2024-01-01 00:00:01"),
      (9L, 4L, "click", "2024-01-01 00:00:01"),
      (10L, 4L, "purchase", "2024-01-01 00:00:02")
    ).map { case (id, u, et, t) => (id, u, et, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.funnelSteps(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "view", 3L, 1000000L),
      (2L, "click", 2L, 666666L),
      (3L, "purchase", 1L, 333333L)))
  }

  test("funnelSteps: same-second events do not chain (strict order)") {
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:01")),
      (2L, 1L, "click", ts("2024-01-01 00:00:01"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.funnelSteps(ev, Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 0L)))
  }

  test("lastTouchAttribution: nearest preceding touch wins; no touch = direct") {
    // u1: view@1 click@2 purchase@3 → click. purchase@4 → click again
    //     (touch carry persists). u2: purchase@1 with no touch → direct.
    // u3: view@1 purchase@2 → view.
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:01")),
      (2L, 1L, "click", ts("2024-01-01 00:00:02")),
      (3L, 1L, "purchase", ts("2024-01-01 00:00:03")),
      (4L, 1L, "purchase", ts("2024-01-01 00:00:04")),
      (5L, 2L, "purchase", ts("2024-01-01 00:00:01")),
      (6L, 3L, "view", ts("2024-01-01 00:00:01")),
      (7L, 3L, "purchase", ts("2024-01-01 00:00:02")),
      (8L, 3L, "error", ts("2024-01-01 00:00:01"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.lastTouchAttribution(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("click", 2L, 500000L), ("direct", 1L, 250000L), ("view", 1L, 250000L)))
  }

  test("lastTouchAttribution: same-second tie resolved by tie column") {
    // touch and conversion share the second; event_id orders them —
    // touch id 1 < purchase id 2 ⇒ the touch precedes and is credited.
    val ev = Seq(
      (1L, 1L, "click", ts("2024-01-01 00:00:01")),
      (2L, 1L, "purchase", ts("2024-01-01 00:00:01"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.lastTouchAttribution(ev)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("click", 1L)))
  }

  test("basketLift: hand-computed support/confidence/lift") {
    // baskets: {A,B,C}, {A,B}, {A}, {B,C} → N=4; c(A)=3 c(B)=3 c(C)=2
    // pairs: AB×2, AC×1, BC×2 → minPairCount=2 keeps AB, BC.
    // AB: support 2e6/4=500000, conf 2e6/3=666666, lift 2*4e6/(3*3)=888888
    // BC: support 500000, conf 666666, lift 2*4e6/(3*2)=1333333
    val lines = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "B"), // dup line folds in distinct
      (3L, "A"),
      (4L, "B"), (4L, "C")
    ).toDF("l_orderkey", "l_partkey")
    val out = Retail.basketLift(lines, minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 500000L, 666666L, 888888L),
      ("B", "C", 2L, 500000L, 666666L, 1333333L)))
  }

  test("rfmSegments: quartile scores on an 8-customer fixture") {
    // 8 customers, single orders, distinct dates and prices:
    // recency ranks 1..8 → ntile(4) buckets (1,1),(2,2),(3,3),(4,4).
    val orders = (1 to 8).map { i =>
      (i.toLong, ts(f"2024-01-0$i 00:00:00"), i * 100.0 + 0.5)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Retail.rfmSegments(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7)))
    // cust 8 ordered last (most recent: recency 0 → r=1) and spent most
    // (m=1); frequency all tie at 1 → tie-break by custkey: cust 1-2
    // f=1, 3-4 f=2, 5-6 f=3, 7-8 f=4.
    assert(out.toSeq == Seq(
      (1L, 7L, 4L, 1L, 4L, "4-1-4"),
      (2L, 6L, 4L, 1L, 4L, "4-1-4"),
      (3L, 5L, 3L, 2L, 3L, "3-2-3"),
      (4L, 4L, 3L, 2L, 3L, "3-2-3"),
      (5L, 3L, 2L, 3L, 2L, "2-3-2"),
      (6L, 2L, 2L, 3L, 2L, "2-3-2"),
      (7L, 1L, 1L, 4L, 1L, "1-4-1"),
      (8L, 0L, 1L, 4L, 1L, "1-4-1")))
  }

  test("pageRank: hand-computed 1-iteration scores on a 3-node chain") {
    // a→b, a→c, b→c. outdeg a=2, b=1. After 1 iter:
    // a: 150000 (no in-edges)
    // b: 150000 + (1e6*85e4)//(1e6*2) = 150000+425000 = 575000
    // c: 150000 + 425000 + (1e6*85e4)//(1e6*1) = 150000+425000+850000 = 1425000
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("c", 1425000L, 2L, 0L), ("b", 575000L, 1L, 1L), ("a", 150000L, 0L, 2L)))
  }

  test("pageRank: iteration 2 uses iteration-1 scores (chain fixture)") {
    // iter2: b gets (150000*85e4)//(2e6) = 63750 → 213750;
    // c gets 63750 + (575000*85e4)//1e6 = 63750+488750 → 702500.
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("c", 702500L), ("b", 213750L), ("a", 150000L)))
  }

  test("pageRank: duplicate edges fold; dangling nodes keep receiving") {
    val e = Seq(("a", "b"), ("a", "b")).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("b", 1000000L, 1L, 0L), ("a", 150000L, 0L, 1L)))
  }

  test("sessionize: gap split, per-user 1-based ids, durations") {
    // u1: events at 0s, 10s, 2000s → sessions {0,10} (dur 10) and
    // {2000} (dur 0). u2: single event → one singleton session.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:00:10")),
      (3L, 1L, ts("2024-01-01 00:33:20")),
      (4L, 2L, ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.sessionize(ev, gapSeconds = 1800L)
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 1L, 2L, 10L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("sessionize: gap exactly == gapSeconds stays in-session") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.sessionize(ev, gapSeconds = 1800L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("triangleCount: K4 has 4 triangles, every node in 3") {
    val e = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"))
      .toDF("src", "dst")
    val out = Graph.triangleCount(e)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 4L), ("b", 3L, 4L), ("c", 3L, 4L), ("d", 3L, 4L)))
  }

  test("triangleCount: triangle + pendant edge; dups/self-loops/reversals fold") {
    // triangle a-b-c plus pendant c-d; noise: self loop, duplicate and
    // reversed edges must not change counts
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "d"),
        ("d", "d"), ("a", "b"))
      .toDF("src", "dst")
    val out = Graph.triangleCount(e)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("triangleCount: square (4-cycle) has no triangles") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("src", "dst")
    assert(Graph.triangleCount(e).count() == 0L)
  }

  test("ksDrift: hand-computed exact D on a 4-value merge") {
    // a = {1,2,3}, b = {3,4}: cumA·nb − cumB·na over merged values =
    // 2, 4, 3, 0 → D_num 4 → ks = 4e6 // 6 = 666666
    val a = Seq(1.0, 2.0, 3.0).toDF("value")
    val b = Seq(3.0, 4.0).toDF("value")
    val out = EventsOps.ksDrift(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((3L, 2L, 4L, 666666L)))
  }

  test("ksDrift: identical samples have zero drift; disjoint have 1e6") {
    val a = Seq(1.0, 2.0).toDF("value")
    assert(EventsOps.ksDrift(a, a).collect()(0).getLong(3) == 0L)
    val b = Seq(5.0, 6.0).toDF("value")
    assert(EventsOps.ksDrift(a, b).collect()(0).getLong(3) == 1000000L)
  }

  test("concentration: hand-computed Gini and HHI per group") {
    // g: contributor sums 1,1,2,4 (micro ×1e6): S=8e6, W=25e6 →
    // gini (50−40)e6·1e6//32e6 = 312500; HHI 22e12·1e6//64e12 = 343750
    // h: two equal contributors → gini 0, HHI 500000
    val ev = Seq(
      ("g", 1L, 1.0), ("g", 2L, 1.0), ("g", 3L, 2.0),
      ("g", 4L, 1.5), ("g", 4L, 2.5),
      ("h", 1L, 1.0), ("h", 2L, 1.0)
    ).toDF("event_type", "user_id", "value")
    val out = EventsOps.concentration(ev).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("g", 4L, 8000000L, 312500L, 343750L),
      ("h", 2L, 2000000L, 0L, 500000L)))
  }

  test("concentration: zero total is NULL, never a fake 0") {
    val ev = Seq(("z", 1L, 0.0)).toDF("event_type", "user_id", "value")
    val r = EventsOps.concentration(ev).collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("concentration: negative contributor total raises, not silently skews") {
    val ev = Seq(("n", 1L, -5.0), ("n", 2L, 1.0)).toDF("event_type", "user_id", "value")
    intercept[Exception] { EventsOps.concentration(ev).collect() }
  }

  test("funnelSteps maxGap: step outside the window does not count") {
    // u1 clicks 10s after view (in window); u2 clicks 2h after (out)
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 00:00:10")),
      (3L, 2L, "view", ts("2024-01-01 00:00:00")),
      (4L, 2L, "click", ts("2024-01-01 02:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventsOps.funnelSteps(ev, Seq("view", "click"),
        maxGapSeconds = Some(3600L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)))
    // boundary: exactly maxGap is IN the window
    val out2 = EventsOps.funnelSteps(ev, Seq("view", "click"),
        maxGapSeconds = Some(7200L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out2.toSeq == Seq((1L, 2L), (2L, 2L)))
  }

  test("first-touch attribution credits the earliest touch") {
    // view@1 then click@2 then purchase@3: last-touch credits click,
    // first-touch credits view
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:01")),
      (2L, 1L, "click", ts("2024-01-01 00:00:02")),
      (3L, 1L, "purchase", ts("2024-01-01 00:00:03"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val lastT = EventsOps.lastTouchAttribution(ev).collect()(0).getString(0)
    val firstT = EventsOps.lastTouchAttribution(ev, firstTouch = true)
      .collect()(0).getString(0)
    assert(lastT == "click" && firstT == "view")
  }

  test("itemRecs: symmetrized directions, lift-ranked, per-item cut") {
    // baskets from the basketLift fixture: pairs AB (lift 888888) and
    // BC (lift 1333333). A recommends B; B recommends C (higher lift)
    // then A; C recommends B.
    val lines = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"),
      (4L, "B"), (4L, "C")
    ).toDF("l_orderkey", "l_partkey")
    val out = Retail.itemRecs(lines, minPairCount = 2L, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("A", "B", 1L), ("B", "C", 1L), ("B", "A", 2L), ("C", "B", 1L)))
  }

  test("pageRank seeds: restart mass confined to the seed set") {
    // chain a→b→c, seed {a}, 1 iter: a keeps only its restart 150000;
    // b receives a's full initial 1e6 damped → 850000; c gets nothing
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val out = Graph.pageRank(e, iters = 1, seeds = Some(seeds))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("b", 850000L), ("a", 150000L), ("c", 0L)))
  }

  test("fimTransform: hash cuts and PSM re-serialization, hand-derived") {
    // id 1, "a b c d e": c1 = 1 + 40510%3 = 2, c2 = 3 + 69082%2 = 3
    // → PSM = <fim_prefix> a b <fim_suffix> d e <fim_middle> c
    val docs = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.fimTransform(docs).orderBy("doc_id").collect()
    def m(s: String) = Seq(s).toDF("s")
      .select(org.apache.spark.sql.functions.md5($"s")).head().getString(0)
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == (5L, 2L, 3L))
    assert(r1.getString(4) == m("<fim_prefix> a b <fim_suffix> d e <fim_middle> c"))
    // short doc passes through untransformed
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == (2L, 0L, 0L))
    assert(r2.getString(4) == m("x y"))
  }

  test("fimTransform: parts are always non-empty and reassemble the doc") {
    // property over a few lengths/ids: c bounds hold and the three
    // parts partition the token list
    val docs = (1L to 30L).map(i => (i, (1L to (i % 7 + 3)).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.ops.CorpusOps.fimTransform(docs).collect()
    rows.foreach { r =>
      val (n, c1, c2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n < 3L || (c1 >= 1L && c1 < c2 && c2 < n), s"bad cuts: n=$n c1=$c1 c2=$c2")
    }
  }

  test("abTestChi2: hand-computed statistic, significance threshold") {
    // 4/10 vs 8/10: χ² = 20·(8−48)²·1e6 / (10·10·12·8) = 3.333333 —
    // under the 3.841459 critical value
    def units(xa: Int, na: Int, xb: Int, nb: Int) =
      ((1 to na).map(i => ("A", i <= xa)) ++ (1 to nb).map(i => ("B", i <= xb)))
        .toDF("variant", "success")
    val r1 = EventsOps.abTestChi2(units(4, 10, 8, 10)).collect()(0)
    assert((r1.getString(0), r1.getString(1)) == ("A", "B"))
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4), r1.getLong(5)) ==
      (10L, 4L, 10L, 8L))
    assert((r1.getLong(6), r1.getLong(7)) == (400000L, 800000L))
    assert(r1.getLong(8) == 3333333L && !r1.getBoolean(9))
    // 10/100 vs 30/100: χ² = 12.5 — significant
    val r2 = EventsOps.abTestChi2(units(10, 100, 30, 100)).collect()(0)
    assert(r2.getLong(8) == 12500000L && r2.getBoolean(9))
  }

  test("abTestChi2: degenerate margins NULL; wrong variant count raises") {
    val zeros = Seq(("A", false), ("B", false)).toDF("variant", "success")
    val r = EventsOps.abTestChi2(zeros).collect()(0)
    assert(r.isNullAt(8) && r.isNullAt(9))
    val three = Seq(("A", true), ("B", false), ("C", true)).toDF("variant", "success")
    intercept[Exception] { EventsOps.abTestChi2(three).collect() }
  }

  test("survivalTable: descending cumulative of lifetime histogram") {
    // u1 lifetime 0, u2 lifetime 1 (36h span), u3 lifetime 3
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 2L, ts("2024-01-01 00:00:00")), (3L, 2L, ts("2024-01-02 12:00:00")),
      (4L, 3L, ts("2024-01-01 00:00:00")), (5L, 3L, ts("2024-01-04 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = EventsOps.survivalTable(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 3L, 1000000L), (1L, 1L, 2L, 666666L), (3L, 1L, 1L, 333333L)))
  }

  test("bfsDepths: min over multiple paths; horizon cuts unreached") {
    // a→b, b→c, a→c, c→d, d→e from seed a: c reached at depth 1 via
    // the direct edge, e beyond maxDepth 3
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val out = Graph.bfsDepths(e, Seq("a").toDF("node"), maxDepth = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 1L), ("d", 2L), ("e", 3L)))
  }

  test("bfsDepths: isolated seed still reports depth 0") {
    val e = Seq(("x", "y")).toDF("src", "dst")
    val out = Graph.bfsDepths(e, Seq("lonely").toDF("node"), maxDepth = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("lonely", 0L)))
  }

  test("audienceOverlap: hand-computed Jaccard; zero-overlap pairs absent") {
    val ev = Seq(
      ("X", 1L), ("X", 2L), ("X", 3L), ("X", 3L),
      ("Y", 2L), ("Y", 3L),
      ("Z", 4L)
    ).toDF("event_type", "user_id")
    val out = EventsOps.audienceOverlap(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("X", "Y", 3L, 2L, 2L, 666666L)))
  }

  test("readability: hand-computed Flesch milli-points") {
    // "The cat sat." → W=3, S=1, Y: e,a,a → 3 groups.
    // flesch = 206835 − 1015·3//1 − 84600·3//3 = 206835−3045−84600 = 119190
    // doc 2: no terminator → S floored at 1; "go" W=1 Y=1 →
    // 206835 − 1015 − 84600 = 121220
    val docs = Seq((1L, "The cat sat."), (2L, "go"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.readability(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 3L, 119190L), (2L, 1L, 1L, 1L, 121220L)))
  }

  test("modularityByLabel: two clean communities, hand-computed Q terms") {
    import spark.implicits._
    // edges: triangle {1,2,3} + triangle {4,5,6} + one bridge 3-4 → m=7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("node", "label")
    val out = graft.ops.Graph.modularityByLabel(edges, labels).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per community: e_c = 3, d_c = 7 → (4·7·3 − 49)·1e6 / (4·49) = 35e6/196
    assert(out.toSeq == Seq(("x", 3L, 7L, 3L, 178571L), ("y", 3L, 7L, 3L, 178571L)))
    // Q = Σ contrib ≈ 0.357 — positive: the partition beats random
    assert(out.map(_._5).sum > 0)
  }

  test("modularityByLabel: single-label graph has Q ≈ 0 by construction") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val labels = Seq((1L, "z"), (2L, "z"), (3L, "z")).toDF("node", "label")
    val out = graft.ops.Graph.modularityByLabel(edges, labels).collect()
    // e_c = m = 2, d_c = 2m = 4 → 4m·e − d² = 16 − 16 = 0
    assert(out.length == 1 && out.head.getLong(4) == 0L)
  }

  test("assortativity: star is maximally disassortative, clique has zero variance") {
    import spark.implicits._
    // star 0-{1,2,3}: every edge joins deg 3 to deg 1 → r = −1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val s = graft.ops.Graph.assortativity(star).collect().head
    assert(s.getLong(0) == 3L && s.getDouble(1) == -1.0)
    // triangle: all degrees equal → zero variance → NULL r
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val t = graft.ops.Graph.assortativity(tri).collect().head
    assert(t.getLong(0) == 3L && t.isNullAt(1))
  }

  test("priceVolumeBridge: exact micro identity, re-signed volume, one-period segments drop") {
    import spark.implicits._
    val df = Seq(
      // seg A: q 10→15, unit price 2.0→2.0 → pure volume move
      ("A", 1L, 10L, 20.0), ("A", 2L, 15L, 30.0),
      // seg B: q 10→8 (negative Δq), rev 30→40 → price pulls up
      ("B", 1L, 10L, 30.0), ("B", 2L, 8L, 40.0),
      // seg C: only period 1 → dropped (no bridge)
      ("C", 1L, 5L, 5.0)
    ).toDF("seg", "p", "q", "rev")
    val out = graft.ops.Retail.priceVolumeBridge(df, "seg", "p", "q", "rev", 1L, 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // A: vol = 5·20e6/10 = 10e6; price = 10e6 − 10e6 = 0
      ("A", 20000000L, 30000000L, 10L, 15L, 10000000L, 0L),
      // B: vol = −(2·30e6 div 10) = −6e6; price = 10e6 + 6e6 = 16e6
      ("B", 30000000L, 40000000L, 10L, 8L, -6000000L, 16000000L)))
    // identity to the micro on every row
    assert(out.forall(r => r._6 + r._7 == r._3 - r._2))
  }

  test("linkPrediction: distance-2 pairs only, hand-computed integral scores") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 3-4: the only unlinked distance-2
    // pairs are (1,4) and (2,4), both through z=3 (deg 3)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = graft.ops.Graph.linkPrediction(edges, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // cn=1, deg_a=2, deg_b=1 → union 2 → jaccard 500000; ra = 1e6 div 3
      (1L, 4L, 1L, 2L, 1L, 500000L, 333333L),
      (2L, 4L, 1L, 2L, 1L, 500000L, 333333L)))
    // linked pairs never appear even when they share a neighbor
    assert(!out.exists(r => (r._1, r._2) == ((1L, 2L))))
  }

  test("linkPrediction degCap: vacuous cap identical; planted hub's RA loss bounded by 1e6/cap, endpoint degrees stay uncapped") {
    import spark.implicits._
    // planted hub 100 (deg 10: nodes 1, 2, and 8 pendants) plus a
    // normal center 50 (deg 2: nodes 1, 2). Pair (1,2) is reachable
    // through BOTH centers.
    val edges = (Seq((50L, 1L), (50L, 2L), (100L, 1L), (100L, 2L)) ++
      (201L to 208L).map(c => (100L, c))).toDF("src", "dst")
    def run(cap: Option[Long]) =
      graft.ops.Graph.linkPrediction(edges, topK = 100, degCap = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val un = run(None)
    // vacuous cap (above every degree) → identical rows, same order
    assert(run(Some(1000L)) == un)
    // (1,2) uncapped: cn=2 (hub + normal center), ra = 1e6/2 + 1e6/10
    val pairUn = un.find(t => (t._1, t._2) == ((1L, 2L))).get
    assert((pairUn._3, pairUn._7) == ((2L, 600000L)))
    // cap 5 drops the deg-10 hub as a CENTER: hub-only pairs (1–201,
    // 201–202, …) vanish; (1,2) survives via the normal center, and the
    // two centers' own pair (50,100) survives via the sub-cap nodes 1,2
    val capped = run(Some(5L))
    assert(capped.map(t => (t._1, t._2)) == Seq((50L, 100L), (1L, 2L)))
    val pairC = capped.find(t => (t._1, t._2) == ((1L, 2L))).get
    // RA loss is exactly the hub's reciprocal, within the documented
    // 1e6/cap bound; cn becomes "among sub-cap neighbors"
    assert(pairC._3 == 1L && pairC._7 == 500000L)
    assert(pairUn._7 - pairC._7 == 100000L)
    assert(pairUn._7 - pairC._7 <= 1000000L / 5L)
    // endpoint degrees still count the hub edge (deg_a = deg_b = 2)
    assert((pairC._4, pairC._5) == ((2L, 2L)))
  }

  test("revenueRetention: expansion, contraction and churn reconcile; first quarter absent") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, 1L, 100.0, d("1996-01-15")), (2L, 1L, 120.0, d("1996-04-15")),
      (3L, 2L, 100.0, d("1996-01-15")), (4L, 2L, 50.0, d("1996-04-15")),
      (5L, 3L, 100.0, d("1996-01-15"))  // churns
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = graft.ops.Retail.revenueRetention(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // base 300, NRR keeps the expansion (170), GRR caps c1 at 100 (150)
    assert(out.toSeq == Seq(
      (7985L, 3L, 300000000L, 170000000L, 150000000L, 566666L, 500000L)))
  }

  test("abcClassification: cumulative cuts, boundary-crosser lands in the next class") {
    import spark.implicits._
    // revenues 50/30/15/5 of 100: cum 50/80/95/100 → A, A, B, C
    val li = Seq(
      (1L, 10L, 50.0), (2L, 20L, 30.0), (3L, 30L, 15.0), (4L, 40L, 5.0)
    ).toDF("l_orderkey", "l_partkey", "l_extendedprice")
    val out = graft.ops.Retail.abcClassification(li).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10L, 500000L, "A"), (20L, 800000L, "A"),
      (30L, 950000L, "B"), (40L, 1000000L, "C")))
  }

  test("newItemShare: debut week takes full share, repeat items dilute the next") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val orders = Seq(
      (1L, ts(0)), (2L, ts(7))
    ).toDF("o_orderkey", "o_orderdate")
    val lines = Seq(
      (1L, 10L, 10.0), (1L, 20L, 20.0),          // week 0: both debut
      (2L, 10L, 30.0), (2L, 30L, 10.0)           // week 1: repeat + one new
    ).toDF("l_orderkey", "l_partkey", "l_extendedprice")
    val out = graft.ops.Retail.newItemShare(lines, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 30000000L, 30000000L, 1000000L),
      (1L, 2L, 1L, 40000000L, 10000000L, 250000L)))
  }

  test("fulfillmentLag: first-ship lag, exact rank quantiles per priority") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val orders = Seq(
      (1L, "1-URGENT", ts(0)), (2L, "1-URGENT", ts(0)),
      (3L, "1-URGENT", ts(0)), (4L, "1-URGENT", ts(0)), (5L, "1-URGENT", ts(0)),
      (6L, "2-HIGH", ts(10))
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lines = Seq(
      // urgent lags: 1, 2, 3, 4, 5 days (first ship wins for order 1)
      (1L, ts(1)), (1L, ts(9)), (2L, ts(2)), (3L, ts(3)), (4L, ts(4)), (5L, ts(5)),
      (6L, ts(12))
    ).toDF("l_orderkey", "l_shipdate")
    val out = graft.ops.Retail.fulfillmentLag(orders, lines).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // n=5: p50 at rank 3 → 3; p90 at rank ceil(4.5)=5 → 5
    assert(out.toSeq == Seq(
      ("1-URGENT", 5L, 3L, 5L, 5L),
      ("2-HIGH", 1L, 2L, 2L, 2L)))
  }

  test("recBacktest: novel-only recs, out-of-time scoring, profile-less eval customers excluded") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, 1L, d("1996-01-01")), (2L, 2L, d("1996-01-01")),
      (5L, 4L, d("1996-02-01")),
      (3L, 1L, d("1997-06-01")), (6L, 4L, d("1997-06-01")),
      (4L, 3L, d("1997-06-01"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lines = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), // train: pair (10,20) ×2
      (5L, 10L),                                   // cust 4 profile = {10}
      (3L, 99L), (6L, 20L), (4L, 50L)              // eval purchases
    ).toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Retail.recBacktest(lines, orders).collect()(0)
    // cust 1 already owns both items (no novel rec), cust 4 gets 20 and
    // buys it; cust 3 has no profile and never enters the denominator
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 1000000L)))
  }

  test("tripleItemsets: support counting, Apriori prune is invisible in the output") {
    import spark.implicits._
    val li = Seq(
      // {1,2,3} twice → the only frequent triple
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      // {1,2,4}: pair (1,2) lifts to support 3 but (1,4)/(2,4) stay at 1
      (12L, 1L), (12L, 2L), (12L, 4L),
      // all pairs of {5,6,7} frequent, yet no basket holds all three —
      // candidate survives the prune and dies on the triple count
      (13L, 5L), (13L, 6L), (14L, 5L), (14L, 6L),
      (15L, 5L), (15L, 7L), (16L, 5L), (16L, 7L),
      (17L, 6L), (17L, 7L), (18L, 6L), (18L, 7L),
      // duplicate line items fold in the basket distinct
      (10L, 1L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Retail.tripleItemsets(li, minSupport = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 2L)))
  }

  test("kCorePeel: pendant drops, triangle survives, chain cascades to empty") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4—1: the 2-core is exactly the triangle
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val out = graft.ops.Graph.kCorePeel(tri, k = 2, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // chain 1—2—3—4—5: true 2-core is empty; 2 rounds reach it
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(graft.ops.Graph.kCorePeel(chain, k = 2, rounds = 2).count() == 0L)
    // 1 round is the declared from-above truncation: {2,3,4} still alive
    val partial = graft.ops.Graph.kCorePeel(chain, k = 2, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(partial.toSeq == Seq((2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("linkPrediction: duplicate and reversed edges fold before scoring") {
    import spark.implicits._
    val edges = Seq((1L, 3L), (3L, 1L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = graft.ops.Graph.linkPrediction(edges, topK = 10).collect()
    // only (1,2) through z=3 (deg 2): ra = 500000, jaccard = 1e6/(1+1-1)
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5),
      r.getLong(6)) == ((1L, 2L, 1L, 1000000L, 500000L)))
  }
}

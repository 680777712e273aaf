package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ann, CorpusOps, Dedup, RangeJoin, SnapshotDiff, TextAnalysis}
import graft.streaming.EventsStream

/** Hardening: every operator must return an EMPTY result on empty input
  * — not throw, not return a phantom row. Empty partitions are routine
  * at scale (filters that eliminate a source, fresh ingestion dates). */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String, String, String)].toDF("doc_id", "text", "lang", "source")
  private lazy val noEvents =
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  private lazy val noVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")

  test("dedup family on empty input") {
    assert(Dedup.exactDedup(noDocs, "doc_id", Seq("lang")).count() == 0)
    assert(Dedup.minHashNearDupsWords(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHashNearDups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.connectedComponents(noPairs).count() == 0)
    assert(Dedup.dedupClusters(noPairs).count() == 0)
    assert(Dedup.incrementalDedup(noDocs, noDocs).count() == 0)
  }

  test("corpus ops on empty input") {
    assert(CorpusOps.withSplit(noDocs).count() == 0)
    assert(CorpusOps.repetitionStats(noDocs).count() == 0)
    assert(CorpusOps.contamination(noDocs, noDocs).count() == 0)
    assert(CorpusOps.quotaSample(noDocs, 5).count() == 0)
    assert(CorpusOps.quotaSample(noDocs, 5, salts = 4).count() == 0)
    assert(CorpusOps.leakageSafeSplit(noDocs, noPairs).count() == 0)
    assert(CorpusOps.mixSources(noDocs, Map("a" -> 2.5)).count() == 0)
    assert(CorpusOps.vocabTopK(noDocs, 5).count() == 0)
    assert(CorpusOps.topTermPerDoc(noDocs).count() == 0)
    assert(CorpusOps.lengthQuantiles(noDocs).count() == 0)
    assert(TextAnalysis.profile(noDocs).count() == 0)
    assert(TextAnalysis.piiStats(noDocs).count() == 0)
  }

  test("embedding ops on empty input") {
    assert(Ann.bruteTopK(noVecs, noVecs, "vec_id", "embedding", 3).count() == 0)
    assert(Ann.embeddingNearDups(noVecs, "vec_id", "embedding").count() == 0)
    assert(Ann.quantizeInt8(noVecs).count() == 0)
    assert(Ann.l2Normalize(noVecs).count() == 0)
  }

  test("event ops on empty input") {
    assert(EventsStream.tumblingCounts(noEvents).count() == 0)
    assert(EventsStream.slidingCounts(noEvents).count() == 0)
    assert(EventsStream.sessionize(noEvents).count() == 0)
    assert(EventsStream.dailyRetention(noEvents).count() == 0)
    assert(EventsStream.funnel(noEvents).count() == 0)
    assert(RangeJoin.intervalJoin(noEvents, "ts",
      noEvents.select(col("event_id").as("iid"), col("ts").as("w_start"),
        col("ts").as("w_end")), "w_start", "w_end").count() == 0)
    assert(SnapshotDiff.diff(noDocs, noDocs, "doc_id", Seq("text")).count() == 0)
  }

  test("round-7 additions on empty input") {
    assert(CorpusOps.histogram(noDocs, "doc_id", 5).count() == 0)
    assert(CorpusOps.topKPerGroup(noDocs, Seq("lang"), "doc_id", 3).count() == 0)
    assert(CorpusOps.weightedSample(noDocs, 10, "doc_id").count() == 0)
    assert(CorpusOps.bigramSurprisal(noDocs).count() == 0)
    val noChanges = Seq.empty[(Long, String, String, String, String)]
      .toDF("doc_id", "status", "text", "lang", "source")
    assert(SnapshotDiff.applyDiff(noDocs, noChanges, "doc_id").count() == 0)
    assert(EventsStream.clickAttribution(
      noEvents.select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id")),
      noEvents.select(col("user_id"), col("ts").as("purchase_ts"), col("event_id").as("purchase_id")))
      .count() == 0)
    // kmeans/pca need at least one vector by contract — they must raise
    // loudly, not return phantom rows
    intercept[IllegalArgumentException] {
      graft.ops.Clustering.kmeans(noVecs, "vec_id", "embedding", k = 2, iters = 1)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Pca.pcaTop1(noVecs, "vec_id", "embedding")
    }
  }

  test("round-9 additions on empty input") {
    val noSpans = Seq.empty[(Long, Int, Int, Long)]
      .toDF("doc_id", "span_start", "span_end", "n_windows")
    assert(Dedup.applySpanCuts(noDocs, noSpans).count() == 0)
    assert(TextAnalysis.c4LineClean(noDocs).count() == 0)
    assert(CorpusOps.bloomDecontam(noDocs,
      noDocs.select(col("doc_id").as("qid"), col("text")), Seq("qid")).count() == 0)
    assert(CorpusOps.textrankKeywords(noDocs).count() == 0)
    assert(CorpusOps.epochShuffle(noDocs, epoch = 1).count() == 0)
    // BPE on a pair-less corpus: a shorter (here empty) merge table,
    // never a crash mid-round
    assert(CorpusOps.bpeMerges(noDocs, nMerges = 2).count() == 0)
    assert(CorpusOps.bpeMerges(
      Seq((1L, "a b c")).toDF("doc_id", "text"), nMerges = 2).count() == 0)
    assert(CorpusOps.oovRate(noDocs).count() == 0)
    assert(Dedup.continuationPairs(noDocs).count() == 0)
    assert(Dedup.crossSourceMatrix(noPairs, noDocs).count() == 0)
    assert(CorpusOps.selectUnderBudget(
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "quality", "n_tokens"),
      budget = 100L).count() == 0)
  }

  test("this round's additions on empty input") {
    assert(CorpusOps.boilerplateLines(noDocs).count() == 0)
    assert(TextAnalysis.dedupLinesWithin(noDocs).count() == 0)
    assert(graft.ops.EventsOps.ewmaSmooth(noEvents).count() == 0)
    // empty on EITHER side of the contamination probe
    assert(CorpusOps.contaminationSpans(noDocs, noDocs).count() == 0)
    val someDocs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(CorpusOps.contaminationSpans(someDocs, noDocs).count() == 0)
    assert(CorpusOps.contaminationSpans(noDocs, someDocs).count() == 0)
  }

  test("analytics/graph batch on empty input") {
    import graft.ops.{EventsOps, Graph, Retail}
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    val noLines = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    val noOrders = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    // funnel is a REPORT: empty input yields the step rows with zero
    // counts (a funnel with no users is still a funnel), never a throw
    val f = EventsOps.funnelSteps(noEvents, Seq("view", "click")).collect()
    assert(f.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 0L), (2L, 0L)))
    assert(EventsOps.lastTouchAttribution(noEvents).count() == 0)
    assert(EventsOps.sessionize(noEvents).count() == 0)
    assert(EventsOps.ksDrift(noEvents, noEvents).count() == 0)
    assert(EventsOps.concentration(noEvents).count() == 0)
    assert(Graph.pageRank(noEdges).count() == 0)
    assert(Graph.triangleCount(noEdges).count() == 0)
    assert(Retail.basketLift(noLines).count() == 0)
    assert(Retail.itemRecs(noLines).count() == 0)
    assert(Retail.rfmSegments(noOrders).count() == 0)
    assert(CorpusOps.cooccurLift(noDocs).count() == 0)
    assert(CorpusOps.fimTransform(noDocs).count() == 0)
    assert(TextAnalysis.readability(noDocs).count() == 0)
  }

  test("stats/profiling wave on empty input") {
    import graft.ops.{EventsOps, Governance, Stats}
    val noXY = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(Stats.paretoFrontier(noXY, "x", "y").count() == 0)
    // moment aggregates over zero rows: every pair present, corr NULL
    val corr = Stats.correlationMatrix(
      Seq.empty[(Double, Double)].toDF("a", "b"), Seq("a", "b")).collect()
    assert(corr.length == 1 && corr.head.getLong(2) == 0L && corr.head.isNullAt(3))
    // Benford is a REPORT: 9 digit rows with zero counts, NULL ppm
    assert(Governance.benfordScreen(noEvents, "value").count() == 9)
    // profile is a REPORT: one row per audited column even with no rows
    val prof = Governance.cardinalityProfile(noEvents, Seq("event_type")).collect()
    assert(prof.length == 1 && prof.head.getLong(1) == 0L)
    assert(EventsOps.acfByKey(noEvents).count() == 0)
    assert(EventsOps.markovNext(noEvents).count() == 0)
    assert(EventsOps.typeEntropy(noEvents).count() == 0)
    assert(EventsOps.crossCorrelation(noEvents).count() == 0)
    assert(EventsOps.seasonalProfile(noEvents).count() == 0)
    assert(EventsOps.seasonalNaiveMase(noEvents).count() == 0)
    assert(EventsOps.lorenzDeciles(noEvents).count() == 0)
    // audits are REPORTS: one row, zero counts, NULL rates
    val noFk = Seq.empty[(Long, Long)].toDF("fk", "x")
    val noPk = Seq.empty[(Long, Long)].toDF("pk", "y")
    val ri = Governance.refIntegrity(noFk, noPk, "fk", "pk", "r").collect()
    assert(ri.length == 1 && ri.head.getLong(1) == 0L && ri.head.isNullAt(4))
    val fd = Governance.fdCheck(noFk, "fk", "x").collect()
    assert(fd.length == 1 && fd.head.getLong(2) == 0L && fd.head.getBoolean(4))
    val ku = Governance.keyUniqueness(noFk, Seq("fk")).collect()
    assert(ku.length == 1 && ku.head.getLong(1) == 0L && ku.head.isNullAt(5))
  }

  test("stats-test and state-merge ops on empty input") {
    import graft.ops.{EventsOps, Governance, SnapshotDiff}
    assert(EventsOps.trimmedMean(noEvents).count() == 0)
    assert(EventsOps.wilsonInterval(noEvents).count() == 0)
    assert(EventsOps.quantileNormalize(noEvents, "click", "purchase").count() == 0)
    assert(EventsOps.activityStreaks(noEvents).count() == 0)
    assert(EventsOps.wowGrowth(noEvents).count() == 0)
    // Mann–Whitney is a REPORT: one row, zero counts, NULL z
    val mw = EventsOps.mannWhitneyU(noEvents, "view", "purchase").collect()
    assert(mw.length == 1 && mw.head.getLong(2) == 0L && mw.head.isNullAt(6))
    // Cramér's V report on empty input: one row, NULL V (no crash)
    val cv = Governance.cramersV(noEvents, "event_type", "user_id").collect()
    assert(cv.length == 1 && cv.head.isNullAt(6))
    val np = Governance.nullPatterns(noEvents, Seq("value")).count()
    assert(np == 0)
    assert(SnapshotDiff.aggState(noEvents).count() == 0)
    assert(SnapshotDiff.mergeAggState(
      SnapshotDiff.aggState(noEvents), SnapshotDiff.aggState(noEvents)).count() == 0)
  }

  test("p175-p219 wave ops on empty input") {
    import graft.ops.{EventsOps, Governance, Stats}
    assert(EventsOps.twap(noEvents).count() == 0)
    assert(EventsOps.ohlcBars(noEvents).count() == 0)
    assert(EventsOps.heavyChangers(noEvents).count() == 0)
    assert(EventsOps.weightedMedian(
      noEvents.withColumn("weight", lit(1L))).count() == 0)
    assert(EventsOps.positionAttribution(noEvents).count() == 0)
    assert(EventsOps.slaPercentiles(noEvents).count() == 0)
    assert(EventsOps.decayScore(noEvents).count() == 0)
    assert(EventsOps.cumulativeUniques(noEvents).count() == 0)
    assert(EventsOps.sloBurn(noEvents).count() == 0)
    assert(EventsOps.seasonalOutliers(noEvents).count() == 0)
    assert(EventsOps.qqTable(noEvents).count() == 0)
    assert(EventsOps.mixShift(noEvents).count() == 0)
    assert(EventsOps.burstiness(noEvents).count() == 0)
    assert(EventsOps.woeIv(noEvents).count() == 0)
    // one-row REPORTS stay one-row with NULL/zero fields, never crash
    val cd = EventsOps.cuped(noEvents).collect()
    assert(cd.length == 1 && cd.head.getLong(0) == 0L && cd.head.isNullAt(2))
    val rc = EventsOps.ratioMetricCI(noEvents).count()
    assert(rc == 0)
    val did = EventsOps.diffInDiff(noEvents).collect()
    assert(did.length == 1 && did.head.getLong(0) == 0L && did.head.getLong(8) == 0L)
    val kpi = EventsOps.sessionKpis(noEvents).collect()
    assert(kpi.length == 1 && kpi.head.getLong(0) == 0L && kpi.head.isNullAt(2))
    val sa = Governance.sequenceAudit(noEvents, "user_id", "event_id", "t").collect()
    assert(sa.length == 1 && sa.head.getLong(1) == 0L)
    assert(Governance.lDiversity(noEvents, Seq("event_type"), "user_id", 2L).count() == 0)
    assert(Governance.freshnessReport(noEvents, "user_id").count() == 0)
    assert(Governance.tableFingerprint(
      noDocs.select(col("text").as("_r")), col("_r")).count() == 0)
    assert(Governance.partitionBalance(noEvents, "user_id").count() == 0)
    assert(Governance.mutualInformation(noEvents, "event_type", "user_id").count() == 0)
    val jc = Governance.joinCardinality(noEvents, noEvents, "user_id", "user_id").collect()
    assert(jc.length == 1 && jc.head.getString(4) == "0")
    assert(Stats.rankReport(noEvents, "event_type", "value", "event_id").count() == 0)
    assert(Stats.neymanAllocation(noEvents, "event_type", "value", 10L).count() == 0)
    assert(CorpusOps.curriculumOrder(noDocs).count() == 0)
    assert(CorpusOps.tokenizerStats(noDocs).count() == 0)
    assert(CorpusOps.hashingVectorizer(noDocs).count() == 0)
    assert(CorpusOps.targetEncoding(noEvents, "event_type", "value").count() == 0)
    assert(CorpusOps.rareLevelCollapse(noEvents, "event_type", 2L).count() == 0)
    assert(CorpusOps.vocabGrowth(noDocs).count() == 0)
    assert(CorpusOps.rrfFusion(noPairs.select(col("a").as("doc_id"),
        col("b").cast("int").as("rank")),
      noPairs.select(col("a").as("doc_id"), col("b").cast("int").as("rank"))).count() == 0)
    assert(CorpusOps.ccnetBuckets(noDocs).count() == 0)
    assert(SnapshotDiff.goldenRecord(noEvents, "user_id", "ts", "event_id",
      Seq("value")).count() == 0)
    assert(SnapshotDiff.asOf(noEvents
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long")), 1L).count() == 0)
    assert(TextAnalysis.gopherRules(noDocs).count() == 0)
  }

  test("round-10 additions on empty input") {
    val noUnits = Seq.empty[(Long, String, String)].toDF("id", "blk", "f")
    assert(graft.ops.FuzzyJoin.fellegiSunter(noUnits, noUnits, "id", "id", "blk",
      Seq(("f", 900000L, 100000L))).count() == 0)
    assert(graft.ops.Governance.krippendorffAlpha(
      Seq.empty[(Long, String)].toDF("unit", "label"), "unit", "label")
      // scalar-fold op: one row with zero counts and NULL alpha, not a crash
      .collect().head.getLong(0) == 0L)
    assert(graft.ops.Stats.nnMatchAtt(
      Seq.empty[(Long, Boolean, Long, Long)].toDF("id", "t", "s", "y"),
      "id", "t", "s", "y").count() == 0)
    // STATICALLY-empty only: this LocalRelation lets the optimizer prove
    // emptiness. A genuinely empty distributed scan (e.g. empty parquet)
    // is a runtime fact and raises "no usable timestamps" instead —
    // documented in the scaladoc, same behavior as the old require()
    assert(graft.ops.EventsOps.temporalSplit(noEvents).count() == 0)
    assert(graft.ops.EventsOps.winsorize(noEvents).count() == 0)
    assert(graft.ops.EventsOps.acfByKey(noEvents).count() == 0)
  }

  test("round-11 additions on empty input") {
    // mannWhitney: group-keyed final aggregate → empty, not a raise
    assert(graft.ops.Stats.mannWhitney(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v").count() == 0)
    // adjustedRand: scalar-fold → one zero-count row, NULL index
    val ar = graft.ops.Governance.adjustedRand(
      Seq.empty[(String, String)].toDF("a", "b"), "a", "b").collect().head
    assert(ar.getLong(0) == 0L && ar.isNullAt(1))
    // the relative stop-gram ceiling path on an empty corpus: the 1-row
    // doc-count broadcast is 0, the ceiling resolves, output is empty
    assert(graft.ops.Dedup.containmentPairs(noDocs,
      dfCeilingFraction = Some(0.5)).count() == 0)
    // valueOutliers' in-plan threshold on empty input: no stats rows,
    // no raise, empty output (the old driver collect returned early)
    assert(graft.ops.EventsOps.valueOutliers(noEvents).count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ops.{CorpusOps, Packing, TextAnalysis}

/** Corpus-curation ops: content-addressed splits, length quantiles, and
  * sequence packing (blocked two-pass == global window, bit-equal). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("content split is deterministic and co-locates identical content") {
    val a = Seq(("hello  world", 1), ("hello world", 2), ("otra cosa", 3)).toDF("text", "id")
    val out = CorpusOps.withSplit(a).select("id", "split").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // whitespace-normalized fingerprint: reflowed duplicates share a split
    assert(out(1) == out(2))
    val again = CorpusOps.withSplit(a).select("id", "split").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == again)
  }

  test("split covers every row with the three labels, train dominant") {
    val counts = CorpusOps.withSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts("train") > counts.getOrElse("test", 0L))
  }

  test("approx quantile path stays within 5% (or 1 token) of exact per group") {
    val exact = CorpusOps.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = CorpusOps.lengthQuantiles(docs, approx = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (n, e50, e90, e99)) =>
      val (an, a50, a90, a99) = approx(lang)
      assert(an == n, s"$lang n_docs")
      Seq(("p50", a50, e50), ("p90", a90, e90), ("p99", a99, e99)).foreach {
        case (label, a, e) =>
          assert(math.abs(a - e) <= math.max(e * 0.05, 1.0), s"$lang $label: approx=$a exact=$e")
      }
    }
  }

  test("length quantiles match a driver-side sorted computation") {
    val got = CorpusOps.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val lens = docs
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def q(xs: Seq[Double], p: Double): Double = {
      val rank = p * (xs.length - 1)
      val lo = xs(rank.toInt)
      val hi = xs(math.min(rank.toInt + 1, xs.length - 1))
      val frac = rank - rank.toInt
      math.rint((lo + frac * (hi - lo)) * 1e4) / 1e4
    }
    lens.foreach { case (lang, xs) =>
      val (p50, p90, p99) = got(lang)
      assert(math.abs(p50 - q(xs, 0.5)) < 1e-9, s"$lang p50")
      assert(math.abs(p90 - q(xs, 0.9)) < 1e-9, s"$lang p90")
      assert(math.abs(p99 - q(xs, 0.99)) < 1e-9, s"$lang p99")
    }
  }

  test("blocked packing is bit-equal to the global window, wide stages parallel") {
    val t = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val blocked = Packing.packSequences(t, "doc_id", "n_tokens", maxLen = 512, blockSize = 64)
      .orderBy("doc_id").collect().map(_.toSeq)
    val global = Packing.packSequencesGlobal(t, "doc_id", "n_tokens", maxLen = 512)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(blocked.toSeq == global.toSeq)
  }

  test("repetitionStats: hand-computed counts, single-token and empty docs") {
    val df = Seq(
      (1L, "a b a b a"),       // toks: a×3 b×2; bigrams: "a b"×2 "b a"×2
      (2L, "solo"),            // 1 token, 0 bigrams
      (3L, "   "),             // no tokens → excluded
      (4L, "x x x x")          // toks: x×4; bigrams: "x x"×3
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionStats(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 5L, 2L, 3L, 4L, 2L, 2L),
      (2L, 1L, 1L, 1L, 0L, 0L, 0L),
      (4L, 4L, 1L, 4L, 3L, 1L, 3L)))
  }

  test("contamination: flags shared word-3-grams only; bench side broadcast") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // shares 2 grams with bench
      (2L, "nothing common here whatsoever"),  // clean
      (3L, "x alpha beta gamma y")             // shares 1 gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val df = CorpusOps.contamination(corpus, bench)
    val out = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (3L, 1L, 1L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("contaminationSpans: maximal islands at exact token coordinates") {
    // doc 1: tokens 0..9; bench covers tokens 2..7 ("c2 c3 c4 c5 c6 c7")
    // → with n=3, matching gram starts are 2,3,4,5 → one island [2, 8)
    val corpus = Seq(
      (1L, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (2L, "no overlap in this document at all"),
      // doc 3: two separated copies of a bench gram → TWO islands
      (3L, "c2 c3 c4 z1 z2 z3 z4 c2 c3 c4")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "c2 c3 c4 c5 c6 c7")).toDF("doc_id", "text")
    val out = CorpusOps.contaminationSpans(corpus, bench, n = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2, 8, 4L),
      (3L, 0, 3, 1L),
      (3L, 7, 10, 1L)))
  }

  test("contaminationSpans feed applySpanCuts: leaked tokens surgically removed") {
    val corpus = Seq((1L, "keep0 keep1 bad0 bad1 bad2 keep2")).toDF("doc_id", "text")
    val bench = Seq((9L, "bad0 bad1 bad2")).toDF("doc_id", "text")
    val spans = CorpusOps.contaminationSpans(corpus, bench, n = 3)
    val cleaned = graft.ops.Dedup.applySpanCuts(corpus, spans).collect()(0)
    assert(cleaned.getLong(1) == 6L && cleaned.getLong(2) == 3L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("keep0 keep1 keep2".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(cleaned.getString(3) == md5)
  }

  test("contaminationSpans: bench shorter than n contributes nothing") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b")).toDF("doc_id", "text")
    assert(CorpusOps.contaminationSpans(corpus, bench, n = 3).isEmpty)
  }

  test("quotaSample caps each group, deterministic across reruns") {
    val d = docs
    val out = CorpusOps.quotaSample(d, quota = 5)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 5))
    assert(out.agg(max("pick_rank")).first().getInt(0) <= 5)
    val a = out.orderBy("source", "pick_rank").collect().map(_.toSeq)
    val b = CorpusOps.quotaSample(d.repartition(7), quota = 5)
      .orderBy("source", "pick_rank").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // content-addressed: stable under reshuffle
  }

  test("quotaSample: salted two-phase pre-prune is result-identical") {
    val a = CorpusOps.quotaSample(docs, quota = 7)
      .orderBy("source", "pick_rank").collect().map(_.toSeq)
    val b = CorpusOps.quotaSample(docs, quota = 7, salts = 4)
      .orderBy("source", "pick_rank").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("quotaSample plan: one hash shuffle on the group key, no global range sort") {
    val p = CorpusOps.quotaSample(docs, quota = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("vocabTopK: counts and deterministic tie-break, hand-computed") {
    val d = Seq((1L, "b a b"), (2L, "a c B")).toDF("doc_id", "text")
    val out = CorpusOps.vocabTopK(d, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // lowercased: a×2 b×3 c×1 → top-2 = (b,3), (a,2)
    assert(out.toSeq == Seq(("b", 3L), ("a", 2L)))
    val tied = Seq((1L, "x y")).toDF("doc_id", "text")
    val t = CorpusOps.vocabTopK(tied, k = 1).first()
    assert(t.getString(0) == "x") // count tie broken alphabetically
  }

  test("topTermPerDoc: tf argmax with df and alphabetic tie-breaks") {
    val d = Seq(
      (1L, "a a b"),    // tf: a=2 → top a
      (2L, "b c"),      // tf tie; df(b)=2 > df(c)=... b in docs 1,2; c in 2,3 → df both 2 → alpha: b
      (3L, "c c a")     // top c
    ).toDF("doc_id", "text")
    val out = CorpusOps.topTermPerDoc(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("lengthDeciles: balanced buckets on uniform lengths, ties go up") {
    val d = (1L to 100L).map(i => (i, ("w " * i.toInt).trim)).toDF("doc_id", "text")
    val out = CorpusOps.lengthDeciles(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.forall(r => r._3 >= 1 && r._3 <= 10))
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.size == 10 && sizes.values.forall(n => n >= 9 && n <= 11))
    // monotone: longer docs never land in a lower bucket
    val byLen = out.sortBy(_._2).map(_._3)
    assert(byLen.sameElements(byLen.sorted))
  }

  test("lengthDeciles: no Spark job fires at DataFrame construction") {
    // the round-10 verdict's p52 finding: the old implementation ran
    // `.first()` for the cut list while BUILDING the DataFrame; the
    // rank-ladder rewrite must keep the cuts fully in-plan
    val group = "ldec-construction-probe"
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
      val d = (1L to 20L).map(i => (i, ("w " * i.toInt).trim)).toDF("doc_id", "text")
      val df = CorpusOps.lengthDeciles(d)
      // flush marker: the listener bus is FIFO, so once this job's
      // start event lands, any construction-time job would have too
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get() == 0 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(seen.get() == 1, s"expected only the flush job, saw ${seen.get()}")
      // and the plan still executes correctly afterwards
      assert(df.count() == 20)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("mixSources: integer weights exact, zero drops, fractional in bounds") {
    val base = CorpusOps.mixSources(docs, Map.empty)
    assert(base.count() == docs.count()) // default ×1: identity
    val mixed = CorpusOps.mixSources(docs,
      Map("src0" -> 3.0, "src1" -> 0.0, "src2" -> 2.5))
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 3 * orig("src0"))
    assert(!bySrc.contains("src1"))
    assert(bySrc("src2") >= 2 * orig("src2") && bySrc("src2") <= 3 * orig("src2"))
    val again = CorpusOps.mixSources(docs.repartition(5),
      Map("src0" -> 3.0, "src1" -> 0.0, "src2" -> 2.5)).count()
    assert(again == mixed.count()) // content-hash draw: reshuffle-stable
  }

  test("leakageSafeSplit: cluster members inherit the representative's split") {
    val d = Seq(
      (1L, "first piece of content"),
      (5L, "first piece of content slightly changed"), // near-dup of 1
      (9L, "totally separate content")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 5L)).toDF("a", "b")
    val out = CorpusOps.leakageSafeSplit(d, pairs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val own = CorpusOps.withSplit(d).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == own(1L)) // representative keeps its own split
    assert(out(5L) == own(1L)) // member inherits it (even if own differs)
    assert(out(9L) == own(9L)) // singleton falls back to own
  }

  test("leakageSafeSplit: cluster stays coherent when the min member was filtered out") {
    // cluster {1,5,9} from the pairs, but doc 1 (the component min) was
    // quality-filtered before splitting — 5 and 9 must still agree
    val d = Seq(
      (5L, "first piece of content slightly changed"),
      (9L, "first piece of content changed some more")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 5L), (1L, 9L)).toDF("a", "b")
    val out = CorpusOps.leakageSafeSplit(d, pairs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val own = CorpusOps.withSplit(d).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(5L) == out(9L))     // coherent
    assert(out(5L) == own(5L))     // rep = min PRESENT member (5)
  }

  test("packing invariants: offsets contiguous, seq ids monotone, in-range") {
    val t = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val rows = Packing.packSequences(t, "doc_id", "n_tokens", maxLen = 512, blockSize = 64)
      .orderBy("doc_id")
      .select("n_tokens", "start_offset", "seq_id", "offset_in_seq")
      .collect()
    var expected = 0L
    var prevSeq = -1L
    rows.foreach { r =>
      assert(r.getLong(1) == expected, "offset must be the running token sum")
      expected += r.getLong(0)
      assert(r.getLong(2) >= prevSeq, "seq ids must be monotone")
      prevSeq = r.getLong(2)
      assert(r.getLong(3) >= 0 && r.getLong(3) < 512)
      assert(r.getLong(2) == r.getLong(1) / 512)
    }
  }

  test("bm25TopK: multi-term match with a rare term outranks high-tf common term") {
    // N=3, df(a)=2, df(b)=1. d2 matches both terms (incl. the rare b):
    // score ~= idf_a + idf_b ~= 0.47 + 0.98; d1 matches only common a:
    // idf_a * 6.6/4.2 ~= 0.74. Clear margin, no float hazard.
    val docs = Seq(
      (1L, "a a a x"),
      (2L, "a b x y"),
      (3L, "x y z w")
    ).toDF("doc_id", "text")
    val out = CorpusOps.bm25TopK(docs, query = "a b", k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1, 2L, 2L, 2L),   // rank 1: d2, both terms, tf 1+1
      (2, 1L, 1L, 3L)))  // rank 2: d1, one term, tf 3; d3 never matches
  }

  test("bm25TopK: duplicate docs tie exactly and break on doc_id") {
    val docs = Seq(
      (10L, "a b c"), (7L, "a b c"), (5L, "z z z")
    ).toDF("doc_id", "text")
    val out = CorpusOps.bm25TopK(docs, query = "a b", k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((1, 7L), (2, 10L)))
  }

  test("chunkTokens: strided windows, truncated tail, empty docs skipped") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b c d e f g h"),               // 8 tokens
      (3L, "   "),                           // whitespace-only → no chunks
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkTokens(docs, chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: starts 0,3,6,9 → lens 4,4,4,1; doc 2: starts 0,3,6 → 4,4,2
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 1L),
      (2L, 0L, 4L), (2L, 1L, 4L), (2L, 2L, 2L),
      (4L, 0L, 1L)))
    val md5OfFirst = java.security.MessageDigest.getInstance("MD5")
      .digest("t0 t1 t2 t3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head._4 == md5OfFirst)
  }

  test("chunkTokens: stride == chunkSize is an exact partition, no overlap") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = CorpusOps.chunkTokens(docs, chunkSize = 4, stride = 4)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 4L), (1L, 4L)))
  }

  test("histogram: hand-computed bins, max lands in the last bucket") {
    val df = Seq(0L, 1L, 2L, 5L, 9L, 10L).toDF("v")
    // lo=0, hi=10, 5 bins of width 2: [0,2)→{0,1}, [2,4)→{2}, [4,6)→{5},
    // [8,10]→{9,10} (max folded into the last bucket)
    val out = CorpusOps.histogram(df, "v", 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 2L))
  }

  test("histogram: degenerate single-value domain and empty input") {
    val same = Seq(7L, 7L, 7L).toDF("v")
    val out = CorpusOps.histogram(same, "v", 4).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L && out(0).getLong(1) == 3L)
    assert(CorpusOps.histogram(same.where(lit(false)), "v", 4).count() == 0)
  }

  test("topKPerGroup: score-desc with id tie-break; salted pre-prune identical") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 1L)).toDF("doc_id", "g", "score")
    val out = CorpusOps.topKPerGroup(df, Seq("g"), "score", k = 2)
      .orderBy("g", "rk")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3)))
    // ties on 30 break id-ascending: doc 2 before doc 3
    assert(out.toSeq == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1)))
    val salted = CorpusOps.topKPerGroup(df, Seq("g"), "score", k = 2, salts = 4)
      .orderBy("g", "rk")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3)))
    assert(salted.toSeq == out.toSeq)
  }

  test("weightedSample: deterministic, reshuffle-stable, weight-monotone on dup content") {
    val df = Seq(
      (1L, "same text", 10L), (2L, "same text", 1000L),
      (3L, "other doc", 50L), (4L, "tercero", 7L)).toDF("doc_id", "text", "w")
    val out = CorpusOps.weightedSample(df, n = 4, weightCol = "w", textCol = "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // identical content ⇒ identical u, so the heavier duplicate has the
    // strictly smaller priority ξ = u/w (PPS bias in the right direction)
    val xi = out.toMap
    assert(xi(2L) < xi(1L))
    val again = CorpusOps.weightedSample(df.repartition(7), n = 4, weightCol = "w",
      textCol = "text").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("bigramSurprisal: hand-computed bits, short docs excluded") {
    val df = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab
      (2L, "a b"),     // bigram ab
      (3L, "c")        // single token → no row, and no vote for V
    ).toDF("doc_id", "text")
    // model: c12(ab)=3, c12(ba)=1; c1(a)=3, c1(b)=1; V=2 (a,b — the
    // model's own vocabulary; doc 3's lone "c" trains no bigram)
    // ab: ⌊log2((3+2)/(3+1))⌋ = ⌊log2(1.25)⌋ = 0
    // ba: ⌊log2((1+2)/(1+1))⌋ = ⌊log2(1.5)⌋ = 0
    val out = CorpusOps.bigramSurprisal(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 3L, 0L, 0.0), (2L, 1L, 0L, 0.0)))
  }

  test("bigramSurprisal: V counts right-slot-only tokens (sentence-final words)") {
    // "z" only ever appears as a bigram RIGHT slot; V must still count it
    val df = Seq((1L, "a z"), (2L, "a b")).toDF("doc_id", "text")
    // model: c12(az)=1, c12(ab)=1; c1(a)=2; V=3 (a, z, b)
    // az: ⌊log2((2+3)/(1+1))⌋ = ⌊log2(2.5)⌋ = 1; same for ab
    val out = CorpusOps.bigramSurprisal(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("bigramSurprisal: rare continuations cost more bits than common ones") {
    val common = Seq.fill(20)("the cat sat").mkString(" ")
    val df = (Seq((1L, common), (2L, "cat zzz qqq www"))).toDF("doc_id", "text")
    val out = CorpusOps.bigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(2L) > out(1L))
  }

  test("weightedSample: non-positive weight raises loudly") {
    val df = Seq((1L, "texto", 0L)).toDF("doc_id", "text", "w")
    val e = intercept[Exception] {
      CorpusOps.weightedSample(df, n = 1, weightCol = "w", textCol = "text").collect()
    }
    assert(e.getMessage.contains("non-positive weight"))
  }

  test("datasheet: hand-computed per-source card, dup membership from pairs") {
    val docs = Seq(
      (1L, "one two three four", "en", "web"),
      (2L, "one two three four five six", "en", "web"),
      (3L, "uno dos", "es", "web"),
      (4L, "alpha beta gamma", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val out = CorpusOps.datasheet(docs, pairs)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("books", 1L, 3L, 1L, 0L, 3L, 3L),
      // web: 3 docs, 4+6+2=12 tokens, 2 langs, docs 1+2 in the pair,
      // median of (2,4,6) = 4
      ("web", 3L, 12L, 2L, 2L, 4L, 6L)))
  }

  test("tfidfKeywords: hand-computed ranks, whole-bit idf, stopword suppression") {
    // N = 4 docs; "the" in all 4 → idf_bits = floor(log2(4/4)) = 0 →
    // score 0 regardless of tf; "zebra" in 1 → floor(log2(4)) = 2;
    // "cat" in 2 → floor(log2(2)) = 1; "dog" in 3 → floor(log2(4/3)) = 0
    val docs = Seq(
      (1L, "the the the zebra cat dog"),
      (2L, "the cat dog"),
      (3L, "the dog"),
      (4L, "the")
    ).toDF("doc_id", "text")
    val out = CorpusOps.tfidfKeywords(docs, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      // doc 1: zebra 1·2=2 wins; cat 1·1=1 second (dog and the score 0)
      (1L, 1, "zebra", 1L, 2L), (1L, 2, "cat", 1L, 1L),
      // doc 2: cat 1 wins; dog/the tie at 0 → "dog" < "the" alphabetically
      (2L, 1, "cat", 1L, 1L), (2L, 2, "dog", 1L, 0L),
      // doc 3: all score 0 → alphabetical
      (3L, 1, "dog", 1L, 0L), (3L, 2, "the", 1L, 0L),
      (4L, 1, "the", 1L, 0L)))
  }

  test("ngramNovelty: shared-gram fractions by hand, with the sub-n fallback") {
    val docs = Seq(
      (1L, "x y z w"), // grams {x y z, y z w} — first shared with doc 2
      (2L, "x y z"),   // exactly 3 tokens: one gram, shared
      (3L, "q")        // sub-3: whole text is the gram, unique
    ).toDF("doc_id", "text")
    val out = CorpusOps.ngramNovelty(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 1L, 1L, 0.0),
      (3L, 1L, 0L, 1.0)))
  }

  test("neymanSample: N·sd allocation by hand; zero-variance strata starve; contract") {
    import spark.implicits._
    // A: 4 rows sd 0 (all 5.0) -> w = 0; B: 4 rows of {1,2,3,4} ->
    // var 1.666667, sd 1.290995, w = floor(4*1.290995*1e6) = 5163980;
    // C: 2 rows {0, 10} -> var 50.0, sd 7.071068, w = floor(2*7.071068e6)
    // = 14142136. T = min(6, 10) = 6: base = 6w/W -> B: 1 (rem...), C: 4;
    // extras = 1 -> larger remainder wins.
    val df = ((1 to 4).map(i => (i.toLong, "A", 5.0)) ++
      Seq((5L, "B", 1.0), (6L, "B", 2.0), (7L, "B", 3.0), (8L, "B", 4.0)) ++
      Seq((9L, "C", 0.0), (10L, "C", 10.0))).toDF("id", "h", "v")
    val out = CorpusOps.neymanSample(df, "h", "v", "id", 6L)
      .collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // W = 19306116; base B = 6*5163980/W = 1, base C = 6*14142136/W = 4
    // (84852816/19306116 = 4.39 -> 4); extras = 6-5 = 1 -> goes to the
    // larger remainder; C capped at n=2 regardless
    assert(out.getOrElse("A", 0) == 0) // zero-variance stratum starves
    assert(out("B") + out.getOrElse("C", 0) <= 6)
    assert(out.getOrElse("C", 0) <= 2) // capped at stratum size
    assert(out("B") >= 1)
    // determinism: identical picks across reruns
    val a = CorpusOps.neymanSample(df, "h", "v", "id", 6L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = CorpusOps.neymanSample(df, "h", "v", "id", 6L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
    // all-zero variance: allocation undefined -> raises
    val flat = Seq((1L, "A", 2.0), (2L, "A", 2.0), (3L, "B", 7.0),
      (4L, "B", 7.0)).toDF("id", "h", "v")
    val err = intercept[Exception] {
      CorpusOps.neymanSample(flat, "h", "v", "id", 2L).collect()
    }
    assert(err.toString.contains("measurable variance") ||
      Option(err.getCause).exists(_.toString.contains("measurable variance")))
    assert(CorpusOps.neymanSample(
      Seq.empty[(Long, String, Double)].toDF("id", "h", "v"),
      "h", "v", "id", 5L).count() == 0)
  }

  test("temperatureSample: sqrt shares + largest remainder, by hand") {
    // A:9 B:4 C:1 -> w = 3,2,1 (W=6), N=14, T=7
    // base = 3,2,1 (rem 3,2,1), extras = 1 -> A gets it
    // quotas: A=4 B=2 C=1 — the head source's 64% of the corpus becomes
    // 57% of the sample, the tail's 7% becomes 14%
    val docs = ((1 to 9).map(i => (i.toLong, s"a doc $i", "A")) ++
      (10 to 13).map(i => (i.toLong, s"b doc $i", "B")) ++
      Seq((14L, "c doc", "C"))).toDF("doc_id", "text", "source")
    val out = CorpusOps.temperatureSample(docs)
      .collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(out == Map("A" -> 4, "B" -> 2, "C" -> 1))
  }

  test("temperatureSample caps a boosted tail source at its size") {
    // A:100 B:1 -> w = 10,1 (W=11), N=101, T=50
    // base A=45 (rem 5), B=4 (rem 6); extras=1 -> B wins the extra -> 5,
    // capped at n_B=1. No redistribution (documented policy).
    val docs = ((1 to 100).map(i => (i.toLong, s"a doc $i", "A")) ++
      Seq((101L, "b doc", "B"))).toDF("doc_id", "text", "source")
    val out = CorpusOps.temperatureSample(docs)
      .collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(out == Map("A" -> 45, "B" -> 1))
  }

  test("dsirWeights: whole-bit uni+bigram LLR against the target source, by hand") {
    // target "tgt": doc 1 feats {a, b, a•b}; raw adds doc 2 {a, c, a•c}
    // Nt=3, Nr=6, V=5 ⇒ bitlen(Nr+V)=bitlen(11)=4, bitlen(Nt+V)=bitlen(8)=4
    // a: (bl(2)+4)-(bl(3)+4)=0   b,a•b: (bl(2)+4)-(bl(2)+4)=0
    // c,a•c: ct=0 ⇒ (bl(1)+4)-(bl(2)+4) = -1
    val docs = Seq(
      (1L, "a b", "tgt"),
      (2L, "a c", "other")
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.dsirWeights(docs, "tgt")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0.0),
      (2L, 3L, -2L, -2.0 / 3.0)))
  }

  test("dsirWeights is reshuffle-stable and scores target docs above off-target") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = CorpusOps.dsirWeights(docs, "src0").orderBy("doc_id").collect().toSeq
    val b = CorpusOps.dsirWeights(docs.repartition(7), "src0")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("epochShuffle: a bijective, reshuffle-stable, epoch-keyed permutation") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val e1 = CorpusOps.epochShuffle(docs, epoch = 1, nShards = 4)
    val n = docs.count()
    // bijection: every doc appears once, positions within a shard are 1..size
    assert(e1.count() == n && e1.select("doc_id").distinct().count() == n)
    val contiguous = e1.groupBy("shard")
      .agg(count(lit(1)).as("sz"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .where(col("mx") =!= col("sz") || col("mn") =!= 1)
    assert(contiguous.count() == 0)
    // partition layout of the input cannot change the assignment
    val shuffled = CorpusOps.epochShuffle(docs.repartition(7), epoch = 1, nShards = 4)
      .orderBy("doc_id").collect().toSeq
    assert(e1.orderBy("doc_id").collect().toSeq == shuffled)
    // a different epoch produces a different permutation
    val e2 = CorpusOps.epochShuffle(docs, epoch = 2, nShards = 4)
    val same = e1.as("a").join(e2.as("b"), "doc_id")
      .where(col("a.shard") === col("b.shard") && col("a.pos") === col("b.pos"))
    assert(same.count() < n)
  }

  test("selectUnderBudget: strict greedy cut, bit-equal to the global-window reference") {
    val docs = Seq(
      (1L, 900000L, 40L), (2L, 800000L, 50L), (3L, 800000L, 30L),
      (4L, 700000L, 60L), (5L, 100000L, 10L)
    ).toDF("doc_id", "quality", "n_tokens")
    // order: 1(40) 2(90) 3(120) 4(180) 5(190); budget 120 -> {1,2,3}
    val got = CorpusOps.selectUnderBudget(docs, budget = 120L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((1L, 40L), (2L, 90L), (3L, 120L)))
    // budget 119 excludes doc 3 (strict: never overshoots)
    assert(CorpusOps.selectUnderBudget(docs, budget = 119L).count() == 2)
    // blocked two-pass == one global window, any bucket width
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= 150L)
      .select("doc_id", "quality", "n_tokens", "cum_tokens")
      .orderBy("doc_id").collect().toSeq
    for (bw <- Seq(1L, 7L, 1024L, 1000000L)) {
      val blocked = CorpusOps.selectUnderBudget(docs, 150L, bucketWidth = bw)
        .orderBy("doc_id").collect().toSeq
      assert(blocked == ref, s"bucketWidth=$bw")
    }
  }

  test("oovRate: vocab cutoff is exact and tie-broken; rate in micro-units") {
    // counts: a=3, b=2, c=1, d=1 -> vocabSize=3 keeps {a, b, c} (c beats
    // d on the token tie-break at equal count)
    val docs = Seq((1L, "a a a b b c"), (2L, "c d")).toDF("doc_id", "text")
    val out = CorpusOps.oovRate(docs, vocabSize = 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 6L, 0L, 0L), (2L, 2L, 1L, 500000L)))
  }

  test("bpeMerges learns the classic merges on the Sennrich toy corpus") {
    // words: low x3, lower x2, newest x1.
    // round 1: (l,o)=5 ties (o,w)=5 -> l asc -> merge (l,o)
    // round 2: (lo,w)=5 -> merge (lo,w)
    // round 3: (low,e)=2 ties (e,r)=2 -> "e" < "low" -> merge (e,r)
    val docs = Seq((1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val out = CorpusOps.bpeMerges(docs, nMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L)))
  }

  test("bpeMerges two-pass replace fuses boundary-sharing occurrences (l != r)") {
    // "ababab...": pair (a,b) everywhere; one pass of sentinel replace
    // misses every second occurrence, the second pass recovers them.
    val docs = Seq((1L, "ababab ababab")).toDF("doc_id", "text")
    val out = CorpusOps.bpeMerges(docs, nMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (a,b)=6, (b,a)=4 -> merge (a,b); round 2: every word is
    // "ab ab ab" (full fusion proves pass 2 ran) -> (ab,ab)=4
    assert(out == Seq((1, "a", "b", 6L), (2, "ab", "ab", 4L)))
  }

  test("groupPercentileRank: integer percentile per group, singleton pins 0") {
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 99L)
    ).toDF("doc_id", "source", "quality")
    val out = CorpusOps.groupPercentileRank(d, "source", "quality")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // group a (n=4): order 10(1) < 20(3) < 30(id 2) < 30(id 4) →
    // rk 1..4 → pct 0, 333333, 666666, 1000000; ties split by doc_id
    assert(out(1L) == 0L)
    assert(out(3L) == 333333L)
    assert(out(2L) == 666666L)
    assert(out(4L) == 1000000L)
    assert(out(5L) == 0L) // singleton group
  }

  test("groupPercentileRank is reshuffle-stable") {
    val d = docs.select(col("doc_id"), col("source"), col("n_chars").as("quality"))
    val a = CorpusOps.groupPercentileRank(d, "source", "quality")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = CorpusOps.groupPercentileRank(d.repartition(11), "source", "quality")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bpeEncodeStats: learned merges applied back, hand-computed compression") {
    // Sennrich corpus merges: (l,o), (lo,w), (e,r).
    // "low" -> "low" after (l,o)+(lo,w): 1 token from 3 chars
    // "lower" -> "low e r" -> (e,r) -> "low er": 2 tokens from 5 chars
    // "newest" -> "n e w e s t": only (e,r)? no "e r" adjacency -> 6
    val docs = Seq((1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val out = CorpusOps.bpeEncodeStats(docs, merges).collect()(0)
    // n_words 6; n_sym = 3*3 + 5*2 + 6 = 25; n_bpe = 1*3 + 2*2 + 6 = 13
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((6L, 25L, 13L)))
    assert(out.getLong(4) == 25L * 1000000L / 13L)
  }

  test("bpeEncodeStats is map-only once the merge table is in hand") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p = CorpusOps.bpeEncodeStats(docs, Seq(("e", "r")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("textrankKeywords: hand-computed two-iteration scores on a tiny graph") {
    // "a b a b c": edges a<->b (cnt 3 each way), b<->c (cnt 1);
    // wdeg a=3 b=4 c=1. Two exact integral-damped rounds give
    // a=1329375, b=1127500, c=543125 (worked in the op's doc terms).
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = CorpusOps.textrankKeywords(docs, k = 3, iters = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq((1, "a", 1329375L), (2, "b", 1127500L), (3, "c", 543125L)))
  }

  test("textrankKeywords: all-repeated-word doc gets the damping floor") {
    val docs = Seq((1L, "x x x")).toDF("doc_id", "text")
    val out = CorpusOps.textrankKeywords(docs).collect()
    assert(out.length == 1 && out(0).getString(2) == "x" && out(0).getLong(3) == 150000L)
  }

  test("spanCorruptionPlan: hash selection replayed by hand, islands merged, end clipped") {
    val docs = Seq((7L, ("tok " * 40).trim)).toDF("doc_id", "text") // 40 tokens
    // replay the op's selection rule in plain Scala
    val sel = (0L until 40L).filter(p => (7L * 2654435761L + p * 40503L) % 1000000L < 300000L)
    assert(sel.nonEmpty, "fixture must select at least one start")
    // merge [p, p+5) islands the same way, clip at 40
    val expected = sel.foldLeft(Vector.empty[(Long, Long, Long)]) { case (acc, p) =>
      acc.lastOption match {
        case Some((s, e, c)) if p <= e => acc.init :+ ((s, math.min(p + 5, 40L), c + 1))
        case _ => acc :+ ((p, math.min(p + 5, 40L), 1L))
      }
    }
    val got = CorpusOps.spanCorruptionPlan(docs, densityPpm = 300000L, spanLen = 5)
      .orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // full density: every position selected → exactly one span [0, n)
    val all = CorpusOps.spanCorruptionPlan(docs, densityPpm = 1000000L, spanLen = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(all == Seq((0L, 40L, 40L)))
  }

  test("spanDenoisePairs: hand-built sentinel input/target, span-less pass-through") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y z")).toDF("doc_id", "text")
    val plan = Seq((1L, 1L, 3L), (1L, 6L, 8L)).toDF("doc_id", "span_start", "span_end")
    val out = CorpusOps.spanDenoisePairs(docs, plan).orderBy("doc_id").collect()
    def m(s: String) = Seq(s).toDF("s").select(md5($"s")).head().getString(0)
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == (8L, 2L, 4L))
    assert(r1.getString(4) == m("a <extra_id_0> d e f <extra_id_1>"))
    assert(r1.getString(5) == m("<extra_id_0> b c <extra_id_1> g h"))
    // doc 2 has no plan rows: input is the original text, target empty
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == (3L, 0L, 0L))
    assert(r2.getString(4) == m("x y z") && r2.getString(5) == m(""))
  }

  test("cooccurLift: hand-computed windowed pair counts and integer lift") {
    // doc1 "a b a b"  (window 1): pairs (a,b),(a,b),(a,b) → ab×3
    // doc2 "b c"      : (b,c)×1 — below minPairCount 2 → pruned
    // counts: a=2 b=3 c=1, N=6. lift(ab) = 3·6·1e6 // (2·3) = 3000000
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = CorpusOps.cooccurLift(docs, window = 1, minPairCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("a", "b", 3L, 2L, 3L, 3000000L)))
  }

  test("typeTokenRatio: hand-computed types, hapax and ppm ratios") {
    // source s: tokens a b a c → 4 tokens, 3 types, hapax {b, c}
    val docs = Seq((1L, "a b a", "s"), (2L, "c", "s"), (3L, "z z", "t"))
      .toDF("doc_id", "text", "source")
    val out = CorpusOps.typeTokenRatio(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("s", 4L, 3L, 2L, 750000L, 666666L),
      ("t", 2L, 1L, 0L, 500000L, 0L)))
  }

  test("cooccurLift: window bounds — distance window+1 never pairs") {
    // "x y z": window 2 pairs (x,y),(x,z),(y,z); window 1 drops (x,z)
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val w2 = CorpusOps.cooccurLift(docs, window = 2, minPairCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val w1 = CorpusOps.cooccurLift(docs, window = 1, minPairCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w2 == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(w1 == Set(("x", "y"), ("y", "z")))
  }

  test("curriculumOrder: difficulty tiers round-robin interleaved, total order") {
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d")
    ).toDF("doc_id", "text")
    val out = CorpusOps.curriculumOrder(docs, nBuckets = 2)
      .orderBy("curriculum_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // the two shortest docs land in tier 1, the two longest in tier 2
    assert(out.filter(_._3 == 1).map(_._1).toSet == Set(1L, 2L))
    assert(out.filter(_._3 == 2).map(_._1).toSet == Set(3L, 4L))
    // positions are the dense total order 1..n, round-robin across
    // tiers: odd positions from tier 1, even from tier 2
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(t => (t._4 % 2, t._3.toLong)).forall {
      case (1L, tier) => tier == 1L
      case (0L, tier) => tier == 2L
      case _ => false
    })
    // token counts are the whitespace tokenizer's
    assert(out.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("tokenizerStats: fertility and compression, hand-checked segmentation") {
    val docs = Seq(
      // "ab12cd." → subwords [ab, 12, cd, .] = 4; words = 1; chars = 7
      (1L, "en", "ab12cd."),
      // "hi there" → subwords [hi, there] = 2; words = 2; chars = 8
      (2L, "en", "hi there"),
      // empty text → zero everywhere, NULL ratios (de only has this doc)
      (3L, "de", "")
    ).toDF("doc_id", "lang", "text")
    val out = CorpusOps.tokenizerStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(out.toSeq == Seq(
      ("de", 1L, 0L, 0L, 0L, None, None),
      // en: 3 words, 6 subwords → fertility 2.0; 15 chars / 6 subwords
      ("en", 2L, 15L, 3L, 6L, Some(2000000L), Some(2500000L))))
  }

  test("ccnetBuckets: repetitive docs land in head, novel ones in tail") {
    // three identical highly-predictable docs (every bigram seen 3×)
    // and three docs of unique words (every bigram a singleton)
    val docs = (
      (1L to 3L).map(i => (i, "x y x y x y x y")) ++
      (4L to 6L).map(i => (i, s"u$i v$i w$i z$i q$i r$i"))
    ).toDF("doc_id", "text")
    val out = CorpusOps.ccnetBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getString(4))).sortBy(_._1)
    // 6 docs → terciles of 2: predictable docs fill head (+1 in middle)
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket(1).subsetOf(Set(1L, 2L, 3L)))
    assert(byBucket(3).subsetOf(Set(4L, 5L, 6L)))
    assert(out.map(_._3).toSet == Set("head", "middle", "tail"))
    // ceil-tercile sizes for n=6: 2/2/2
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(1 -> 2, 2 -> 2, 3 -> 2))
  }

  test("hashingVectorizer: stable indices, tf accumulation, bounded dim") {
    val docs = Seq((1L, "a b a"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val out = CorpusOps.hashingVectorizer(docs, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(t => t._2 >= 0 && t._2 < 16))
    // same token → same index across docs; tf counts repeats
    val aIdx1 = out.filter(t => t._1 == 1L && t._3 == 2L).map(_._2)
    val doc2 = out.filter(_._1 == 2L)
    assert(aIdx1.length == 1 && doc2.map(_._2).toSeq == aIdx1.toSeq)
    assert(doc2.head._3 == 1L)
    // empty doc emits nothing
    assert(!out.exists(_._1 == 3L))
  }

  test("targetEncoding: shrinkage pulls rare categories toward the global mean") {
    val df = Seq(
      ("common", 10.0), ("common", 10.0), ("common", 10.0), ("common", 10.0),
      ("common", 10.0), ("common", 10.0), ("common", 10.0), ("common", 10.0),
      ("rare", 100.0)
    ).toDF("cat", "v")
    val out = CorpusOps.targetEncoding(df, "cat", "v", m = 10L)
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // global mean = 180/9 = 20 → gmean 20e6
    // common: (80e6 + 200e6)/18 = 15555555; rare: (100e6 + 200e6)/11
    assert(out.toSeq == Seq(
      ("common", 8L, 10000000L, 15555555L),
      ("rare", 1L, 100000000L, 27272727L)))
    // the rare category's encoding sits far closer to the global mean
    assert(math.abs(out(1)._4 - 20000000L) < math.abs(out(1)._3 - 20000000L))
  }

  test("rareLevelCollapse: below-threshold and NULL levels fold to OTHER") {
    val df = Seq(Option("a"), Option("a"), Option("a"),
      Option("b"), None, None).toDF("cat")
    val out = CorpusOps.rareLevelCollapse(df, "cat", minCount = 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // "a" survives (3 rows); "b" (1 row) and NULL (2 rows — counted as
    // one level) fold: OTHER carries 2 original levels, 3 rows
    assert(out.toSeq == Seq(
      ("OTHER", 2L, 3L, 500000L), ("a", 1L, 3L, 500000L)))
  }

  test("rrfFusion: both-list ids dominate, single-list ids still rank") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("doc_id", "rank")
    val out = CorpusOps.rrfFusion(a, b, kRrf = 60, topK = 10).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    // 11 in both lists: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522
    assert(out.head == ((11L, Some(2L), Some(1L), 32522L)))
    // every id from either list appears; singles carry one term
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L, 13L))
    assert(out.find(_._1 == 10L).get._4 == 1000000L / 61L)
    assert(out.find(_._1 == 13L).get._4 == 1000000L / 62L)
  }

  test("vocabGrowth: types count at first occurrence only, curve flattens") {
    val d = Seq(
      (1L, "a b c"),       // 3 new types
      (2L, "a b d"),       // 1 new type (d)
      (3L, ""),            // zero row survives with zeros
      (4L, "a a a")        // nothing new
    ).toDF("doc_id", "text")
    val out = CorpusOps.vocabGrowth(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 3L, 3L),
      (2L, 3L, 1L, 6L, 4L),
      (3L, 0L, 0L, 6L, 4L),
      (4L, 3L, 0L, 9L, 4L)))
  }

  test("vocabTailMass: ladder of rare-type token shares") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.vocabTailMass(docs, ks = Seq(2L, 5L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (2L, 1L, 1L, 166666L),   // only c is a hapax
      (5L, 3L, 6L, 1000000L))) // everything is rarer than 5
  }

  test("waterfillBudget: small source keeps its supply, the rest split the level, remainder to first") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    val docs = Seq(doc(1, "A", 10), doc(2, "B", 20), doc(3, "C", 100))
      .toDF("doc_id", "source", "text")
    val even = graft.ops.CorpusOps.waterfillBudget(docs, budgetTokens = 40L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(even.toSeq == Seq(("A", 10L, 10L), ("B", 20L, 15L), ("C", 100L, 15L)))
    assert(even.map(_._3).sum == 40L)
    // indivisible residue: the first unsaturated source in name order +1
    val odd = graft.ops.CorpusOps.waterfillBudget(docs, budgetTokens = 43L)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(odd.toSeq == Seq(("A", 10L), ("B", 17L), ("C", 16L)))
    // budget above total: everyone keeps full supply
    val all = graft.ops.CorpusOps.waterfillBudget(docs, budgetTokens = 1000L)
      .collect().map(_.getLong(2)).sum
    assert(all == 130L)
  }

  test("distinctiveTerms: exclusive term lifts per source, shared and thin terms stay out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "apple apple apple apple apple common common"),
      (2L, "B", "banana banana banana banana banana common common")
    ).toDF("doc_id", "source", "text")
    val out = graft.ops.CorpusOps.distinctiveTerms(docs, k = 10, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // lift = 5·7·1e6 / (1·7) = 5e6 (the +1 smoothing absorbs the
    // zero complement); 'common' (2 per source) is below minCount
    assert(out.toSeq == Seq(
      ("A", "apple", 5L, 0L, 5000000L, 1L),
      ("B", "banana", 5L, 0L, 5000000L, 1L)))
  }

  test("negativeSamplingTable: exact floor c^(3/4) weights and full-vocab CDF") {
    import spark.implicits._
    // counts: a×16, b×2, c×1 → w34 = ⌊⁴√c³⌋: 16→8 (exact), 2→⌊⁴√8⌋=1, 1→1
    val docs = Seq(
      (1L, ("a " * 16) + "b b c")
    ).toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.negativeSamplingTable(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // total mass = 8 + 1 + 1 = 10; top-2 CDF stops at 9/10
    assert(out.toSeq == Seq(
      ("a", 16L, 8L, 8L, 800000L),
      ("b", 2L, 1L, 9L, 900000L)))
  }

  test("jsDivergence: hand-computed pointwise terms; identical slices diverge by zero") {
    val df = Seq(("x x y", "A"), ("x z z", "B")).toDF("text", "src")
    val out = CorpusOps.jsDivergence(df, "text", "src", "A", "B").collect()
    assert(out.length == 1)
    val r = out.head
    // A: {x:2, y:1} n=3; B: {x:1, z:2} n=3; vocab {x,y,z}
    // ta(x)=(2/3)ln(4/3)=.191788  tb(x)=(1/3)ln(2/3)=-.135155
    // ta(y)=(1/3)ln2=.231049     tb(z)=(2/3)ln2=.462098
    // js_micro = floor((.422837 + .326943) * 5e5) — the floored micro
    // half-sum, replayed with the identical double expression
    assert(r.getAs[Long]("tokens_a") == 3L && r.getAs[Long]("tokens_b") == 3L)
    assert(r.getAs[Long]("vocab_size") == 3L)
    assert(r.getAs[Long]("js_nats_micro") ==
      math.floor((0.422837 + 0.326943) * 500000.0).toLong)
    assert(math.abs(r.getAs[Long]("js_nats_micro") - 374890L) <= 1)
    val same = Seq(("x y", "A"), ("x y", "B")).toDF("text", "src")
    assert(CorpusOps.jsDivergence(same, "text", "src", "A", "B")
      .collect().head.getAs[Long]("js_nats_micro") == 0L)
  }

  test("zipfSlope: matches the Clauset MLE replayed on hand-built frequencies; below-xmin tail is empty") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // frequencies: a=8, b=4, c=2, d=1; xmin=2 keeps {a,b,c}
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val df = Seq(text).toDF("text")
    val out = CorpusOps.zipfSlope(df, "text", 2L).collect()
    assert(out.length == 1)
    val row = out.head
    val s = r6(Seq(8L, 4L, 2L).map(f => r6(math.log(f / 1.5))).sum)
    val alpha = r6(1.0 + 3.0 / s)
    assert(row.getAs[Long]("xmin") == 2L)
    assert(row.getAs[Long]("n_types") == 3L)
    assert(row.getAs[Double]("alpha") == alpha)
    assert(row.getAs[Double]("alpha_se") == r6((alpha - 1.0) / math.sqrt(3.0)))
    // nothing reaches xmin -> empty output, not a NULL fit
    assert(CorpusOps.zipfSlope(df, "text", 100L).count() == 0)
    assert(CorpusOps.zipfSlope(
      Seq.empty[String].toDF("text"), "text", 2L).count() == 0)
  }

  test("vocabUnseen: hand-counted Chao1 and Good–Turing coverage; empty corpus is empty") {
    // a×3 b×1 c×1 d×2: N=7, V=4, f1=2, f2=1
    // chao1 = 4e6 + 2·1·1e6 div (2·2) = 4_500_000
    // coverage = 1e6 − 2e6 div 7 = 1e6 − 285714 = 714286
    val df = Seq("a a a b", "c d d").toDF("text")
    val r = CorpusOps.vocabUnseen(df, "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("v_types") == 4L)
    assert(r.getAs[Long]("f1_singletons") == 2L)
    assert(r.getAs[Long]("f2_doubletons") == 1L)
    assert(r.getAs[Long]("chao1_est_micro") == 4500000L)
    assert(r.getAs[Long]("coverage_ppm") == 714286L)
    // all-singleton corpus: f2=0 stays defined (the +1 bias correction)
    val single = Seq("x y z").toDF("text")
    val s = CorpusOps.vocabUnseen(single, "text").collect().head
    assert(s.getAs[Long]("chao1_est_micro") == 3L * 1000000L + 3L * 2L * 1000000L / 2L)
    assert(s.getAs[Long]("coverage_ppm") == 0L)
    assert(CorpusOps.vocabUnseen(Seq.empty[String].toDF("text"), "text").count() == 0)
  }

  test("jsDivergenceMatrix: every cell bit-identical to the 2-slice op; ordering; guard; empty") {
    val df = Seq(
      ("x x y", "A"), ("x z z", "B"), ("y y w", "C"), ("x w", "A"))
      .toDF("text", "src")
    val m = CorpusOps.jsDivergenceMatrix(df, "text", "src")
      .collect().map(r => (r.getAs[String]("group_a"),
        r.getAs[String]("group_b")) -> r).toMap
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    for (((a, b), row) <- m) {
      val two = CorpusOps.jsDivergence(df, "text", "src", a, b).collect().head
      assert(row.getAs[Long]("tokens_a") == two.getAs[Long]("tokens_a"))
      assert(row.getAs[Long]("tokens_b") == two.getAs[Long]("tokens_b"))
      assert(row.getAs[Long]("vocab_size") == two.getAs[Long]("vocab_size"))
      assert(row.getAs[Long]("js_nats_micro") ==
        two.getAs[Long]("js_nats_micro"))
    }
    val many = (1 to 5).map(i => (s"t$i", s"g$i")).toDF("text", "src")
    val err = intercept[Exception] {
      CorpusOps.jsDivergenceMatrix(many, "text", "src", maxGroups = 3).collect()
    }
    assert(err.toString.contains("more than 3 groups") ||
      Option(err.getCause).exists(_.toString.contains("more than 3 groups")))
    assert(CorpusOps.jsDivergenceMatrix(
      Seq.empty[(String, String)].toDF("text", "src"), "text", "src")
      .count() == 0)
  }

  test("jsDivergence: one-sided input raises; empty input is empty") {
    val oneSided = Seq(("x y", "A")).toDF("text", "src")
    val e = intercept[Exception] {
      CorpusOps.jsDivergence(oneSided, "text", "src", "A", "B").collect()
    }
    assert(e.toString.contains("both slices") ||
      Option(e.getCause).exists(_.toString.contains("both slices")))
    val empty = Seq.empty[(String, String)].toDF("text", "src")
    assert(CorpusOps.jsDivergence(empty, "text", "src", "A", "B").count() == 0)
  }
}

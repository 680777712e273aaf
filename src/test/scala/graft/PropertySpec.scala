package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ffill
import graft.schema.HeaderRules

/** SURVEY §5 property suite (seeded-random, deterministic): ffill
  * idempotence and prefix stability, snake_case output alphabet, hash
  * determinism. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("ffill is idempotent") {
    val data = (0 until 2000).map(i =>
      (i.toLong, if (rnd.nextInt(4) == 0) Some(s"v$i") else None))
    val df = data.toDF("idx", "v").repartition(5)
    val once = Ffill.ffillBlocked(df, "idx", Seq("v"), blockSize = 128)
    val twice = Ffill.ffillBlocked(once, "idx", Seq("v"), blockSize = 128)
    assert(once.orderBy("idx").collect().map(_.toSeq)
      .sameElements(twice.orderBy("idx").collect().map(_.toSeq)))
  }

  test("ffill prefix stability: appending rows never changes earlier fills") {
    val base = (0 until 500).map(i =>
      (i.toLong, if (rnd.nextInt(3) == 0) Some(s"x$i") else None))
    val extended = base ++ Seq((500L, Some("tail")), (501L, None))
    val a = Ffill.ffillBlocked(base.toDF("idx", "v"), "idx", Seq("v"), 64)
      .orderBy("idx").collect().map(_.toSeq)
    val b = Ffill.ffillBlocked(extended.toDF("idx", "v"), "idx", Seq("v"), 64)
      .orderBy("idx").collect().map(_.toSeq).take(500)
    assert(a.sameElements(b))
  }

  test("connectedComponents matches driver-side union-find on random graphs") {
    import graft.ops.Dedup
    (1 to 5).foreach { trial =>
      val n = 5 + rnd.nextInt(20)
      val edges = (0 until (3 + rnd.nextInt(25))).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // canonical label: min node id in the component among touched nodes
        val r = find(v.toInt)
        v -> nodes.filter(u => find(u.toInt) == r).min
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: edges=$edges")
    }
  }

  test("snake_case renders only [A-Z0-9_] or a COL_ hash fallback") {
    val rules = new HeaderRules()
    val alphabet = "^[A-Z0-9_]+$".r
    val chars = "abcdefghijklmnopqrstuvwxyzáéíóúñ ()/.*°-_,0123456789 "
    (1 to 200).foreach { _ =>
      val len = 1 + rnd.nextInt(40)
      val header = (0 until len).map(_ => chars.charAt(rnd.nextInt(chars.length))).mkString
      val name = rules.generateStandardName(header)
      assert(alphabet.findFirstIn(name).isDefined, s"'$header' -> '$name'")
    }
  }

  test("hash keys are deterministic and prefix-stable") {
    val rules = new HeaderRules()
    assert(rules.computeHash("CO2 combinado (g/km)") ==
      rules.computeHash("CO2 combinado (g/km)"))
    assert(rules.computeHash("a") != rules.computeHash("b"))
    assert(rules.computeHash("x").length == 12)
  }

  test("histogram partitions the input: bucket counts sum to row count, bins in range") {
    import graft.ops.CorpusOps
    (1 to 3).foreach { _ =>
      val n = 50 + rnd.nextInt(500)
      val bins = 2 + rnd.nextInt(20)
      val vals = (0 until n).map(_ => rnd.nextInt(10000).toLong)
      val out = CorpusOps.histogram(vals.toDF("v"), "v", bins).collect()
      assert(out.map(_.getLong(1)).sum == n)
      assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < bins))
    }
  }

  test("weightedSample: scaling all weights never changes the selection") {
    import graft.ops.CorpusOps
    val docs = (0 until 300).map(i =>
      (i.toLong, s"doc body $i ${rnd.nextInt(1000)}", 1L + rnd.nextInt(99))).toDF("doc_id", "text", "w")
    val a = CorpusOps.weightedSample(docs, 40, "w").collect().map(_.getLong(0))
    val scaled = docs.selectExpr("doc_id", "text", "w * 7 AS w")
    val b = CorpusOps.weightedSample(scaled, 40, "w").collect().map(_.getLong(0))
    // ξ = u/w: a uniform weight rescale rescales every priority equally
    assert(a.toSeq == b.toSeq)
  }

  test("interpolateLinear: filled values always lie within the neighbor envelope") {
    import graft.ops.EventsOps
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = (0 until 400).map { i =>
      (1L + i % 3, ts(i.toLong * 7), i.toLong,
        if (rnd.nextInt(3) == 0) Option.empty[Double] else Some(rnd.nextDouble() * 100))
    }.toDF("user_id", "ts", "event_id", "value")
    val src = ev.collect().map(r => r.getLong(2) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val out = EventsOps.interpolateLinear(ev).collect()
    out.foreach { r =>
      val id = r.getLong(1)
      if (!r.isNullAt(2) && src(id).isEmpty) {
        // interpolated: must be within [min, max] micro-units of SOME pair
        // of observed values (coarse envelope: global min/max suffices)
        val known = src.values.flatten.map(v => math.floor(v * 1e6).toLong)
        assert(r.getLong(2) >= known.min && r.getLong(2) <= known.max,
          s"event $id interpolated outside the observed envelope")
      }
    }
  }

  test("zOrderKey is injective on distinct rank pairs") {
    import graft.ops.Layout
    import org.apache.spark.sql.functions._
    val pts = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong * 64 + b, a.toLong, b.toLong)).toDF("id", "a", "b")
    val z = Layout.zOrderKey(pts, "id", "a", "b", bits = 6)
    assert(z.select(countDistinct(col("zv"))).head().getLong(0) == 64L * 64L)
  }

  test("triangleCount is invariant to edge direction, duplicates, and order") {
    import graft.ops.Graph
    // random graph on 30 nodes; a shuffled copy with random flips and
    // duplicated edges must count the identical triangles
    val edges = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}")
    }
    val noisy = rnd.shuffle(edges.map { case (a, b) =>
      if (rnd.nextBoolean()) (b, a) else (a, b)
    } ++ edges.take(30))
    val base = Graph.triangleCount(edges.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val again = Graph.triangleCount(noisy.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(base == again)
  }

  test("pageRank conserves bounded mass: every score in [0, N·1e6]") {
    import graft.ops.Graph
    val edges = (0 until 200).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }.filter(e => e._1 != e._2)
    val out = Graph.pageRank(edges.toDF("src", "dst"), iters = 3).collect()
    val n = out.length.toLong
    // leaky fixed-point: total never exceeds the uniform start mass,
    // and no node goes negative or above the whole graph's mass
    assert(out.map(_.getLong(1)).sum <= n * 1000000L)
    out.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= n * 1000000L))
  }

  test("funnel counts are monotonically non-increasing down the steps") {
    import graft.ops.EventsOps
    val ev = (0 until 600).map { i =>
      (i.toLong, rnd.nextInt(50).toLong,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)),
        java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val counts = EventsOps.funnelSteps(ev, Seq("view", "click", "purchase"))
      .collect().map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("basketLift pair counts never exceed either item's basket count") {
    import graft.ops.Retail
    val lines = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong, s"i${rnd.nextInt(25)}")
    }.toDF("l_orderkey", "l_partkey")
    Retail.basketLift(lines, minPairCount = 1L).collect().foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab <= na && nab <= nb && nab >= 1L)
    }
  }

  test("paretoFrontier matches brute-force dominance on random point sets") {
    import graft.ops.Stats
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    (1 to 5).foreach { trial =>
      val pts = (0 until (20 + rnd.nextInt(60))).map(i =>
        (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      val kept = Stats.paretoFrontier(pts.toDF("id", "x", "y"), "x", "y")
        .collect().map(r => r.getAs[Long]("id")).toSet
      val byId = pts.map(p => p._1 -> ((p._2, p._3))).toMap
      pts.foreach { case (id, x, y) =>
        val dominated = pts.exists(o => o._1 != id && dominates((o._2, o._3), (x, y)))
        assert(kept.contains(id) == !dominated,
          s"trial $trial id=$id ($x,$y) dominated=$dominated kept=${kept.contains(id)}")
      }
    }
  }

  test("markovNext hit counts: hits <= transitions, argmax is a real observed pair") {
    import graft.ops.EventsOps
    val ev = (0 until 600).map { i =>
      (i.toLong, rnd.nextInt(30).toLong,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)),
        java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("event_id", "user_id", "event_type", "ts")
    EventsOps.markovNext(ev).collect().foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(2))
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    }
  }

  test("lorenzDeciles: cumulative shares are monotone and close at exactly 1e6") {
    import graft.ops.EventsOps
    val ev = (0 until 500).map { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        Seq("view", "click")(rnd.nextInt(2)), rnd.nextDouble() * 100.0)
    }.toDF("event_id", "user_id", "event_type", "value")
    val rows = EventsOps.lorenzDeciles(ev, buckets = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(4)))
    rows.groupBy(_._1).values.foreach { g =>
      val shares = g.sortBy(_._2).map(_._3)
      assert(shares.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      assert(shares.last == 1000000L)
    }
  }

  test("positionAttribution: Σ credit = 1e6 × conversions on random journeys") {
    import graft.ops.EventsOps
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(trial)
      val types = Array("view", "click", "purchase")
      val rows = (0 until 400).map { i =>
        (i.toLong, r.nextInt(12).toLong, types(r.nextInt(3)), at(r.nextInt(5000).toLong))
      }
      val df = rows.toDF("event_id", "user_id", "event_type", "ts")
      val out = EventsOps.positionAttribution(df).collect()
      val credit = out.map(_.getLong(2)).sum
      // conversions = purchases (every purchase closes a journey)
      val nConv = rows.count(_._3 == "purchase").toLong
      assert(credit == 1000000L * nConv, s"trial $trial: $credit vs $nConv conversions")
    }
  }

  test("weightedMedian degenerates to the lower median under unit weights") {
    import graft.ops.EventsOps
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(100 + trial)
      val vals = (0 until 101).map(_ => r.nextInt(1000))
      val df = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, "g", v.toDouble, 1L)
      }.toDF("event_id", "event_type", "value", "weight")
      val got = EventsOps.weightedMedian(df).collect().head.getLong(3)
      // odd n, unit weights → the true middle order statistic
      val expect = vals.sorted.apply(50) * 1000000L
      assert(got == expect, s"trial $trial")
    }
  }

  test("twap lies within [min, max] of the observed values") {
    import graft.ops.EventsOps
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val r = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      (i.toLong, s"k${r.nextInt(4)}", at(r.nextInt(10000).toLong),
        (r.nextInt(100000) + 1) / 100.0)
    }
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    EventsOps.twap(df).collect().foreach { row =>
      val k = row.getString(0)
      val vs = rows.filter(_._2 == k).map(t => math.floor(t._4 * 1e6).toLong)
      if (!row.isNullAt(5)) {
        val t = row.getLong(5)
        assert(t >= vs.min && t <= vs.max, s"$k: $t outside [${vs.min}, ${vs.max}]")
      }
    }
  }

  test("slaPercentiles are monotone and drawn from the data") {
    import graft.ops.EventsOps
    val r = new scala.util.Random(9)
    val rows = (0 until 500).map(i =>
      (i.toLong, s"t${r.nextInt(3)}", r.nextInt(10000) / 10.0))
    val df = rows.toDF("event_id", "event_type", "value")
    EventsOps.slaPercentiles(df).collect().foreach { row =>
      val k = row.getString(0)
      val vs = rows.filter(_._2 == k).map(t => math.floor(t._3 * 1e6).toLong).toSet
      val ps = Seq(row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(ps.sliding(2).forall(p => p(0) <= p(1)), s"$k not monotone: $ps")
      ps.foreach(p => assert(vs.contains(p), s"$k percentile $p not an observed value"))
    }
  }

  test("winsorize rank-ladder bounds equal Spark's percentile aggregate on random group shapes") {
    import org.apache.spark.sql.functions._
    import graft.ops.EventsOps
    // adversarial shapes for the interpolation short-circuits: tiny
    // groups (n = 1, 2), heavy duplicates (integral positions with
    // equal bracket values), negatives, and plain randoms
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(trial * 101)
      val rows = (0 until 400).map { i =>
        val g = s"g${r.nextInt(7)}"
        val v = r.nextInt(5) match {
          case 0 => r.nextInt(3).toDouble            // duplicates
          case 1 => -r.nextInt(50) / 3.0             // negatives
          case _ => r.nextDouble() * 100.0
        }
        (i.toLong, g, v)
      } ++ Seq((9001L, "solo", 42.0), (9002L, "duo", 1.0), (9003L, "duo", 2.0))
      val ev = rows.toDF("event_id", "event_type", "value")
      val twinBounds = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.05D)").as("_plo"),
        expr("percentile(value, 0.95D)").as("_phi"))
      val twin = ev.join(twinBounds, Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          floor(least(greatest(col("value"), col("_plo")), col("_phi")) * lit(1000000.0d))
            .cast("long").as("v_w"))
      val out = EventsOps.winsorize(ev)
      assert(out.exceptAll(twin).isEmpty && twin.exceptAll(out).isEmpty, s"trial $trial")
    }
  }

  test("acfByKey blocked ranks equal a key-window lead reference on random series") {
    import org.apache.spark.sql.functions._
    import graft.ops.EventsOps
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(trial * 13)
      val rows = (0 until 300).map { i =>
        (i.toLong, s"k${r.nextInt(4)}", r.nextDouble() * 10 - 5,
          new java.sql.Timestamp(r.nextInt(100000) * 1000L))
      }
      val ev = rows.toDF("event_id", "event_type", "value", "ts")
      // tiny blocks force every lag pair across block boundaries;
      // a huge block reproduces the single-window shape exactly
      val tiny = EventsOps.acfByKey(ev, maxLag = 4, blockMicros = 500000L)
      val one = EventsOps.acfByKey(ev, maxLag = 4, blockMicros = Long.MaxValue)
      assert(tiny.exceptAll(one).isEmpty && one.exceptAll(tiny).isEmpty, s"trial $trial")
    }
  }

  test("curriculumOrder blocked tier cut equals a direct global ntile on random corpora") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.ops.{CorpusOps, TextAnalysis}
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(trial * 17)
      val docs = (0 until 250).map { i =>
        (i.toLong, Seq.fill(1 + r.nextInt(40))("w").mkString(" "))
      }.toDF("doc_id", "text")
      // 1-token blocks force maximal block fragmentation; a huge block
      // reproduces the old single-window shape — both must agree
      val tiny = CorpusOps.curriculumOrder(docs, nBuckets = 7, blockTokens = 1L)
      val one = CorpusOps.curriculumOrder(docs, nBuckets = 7, blockTokens = 1L << 40)
      assert(tiny.exceptAll(one).isEmpty && one.exceptAll(tiny).isEmpty, s"trial $trial")
      // and the replayed arithmetic IS Spark's ntile
      val ref = docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("tier_ref",
          ntile(7).over(Window.orderBy(col("n_tokens"), col("doc_id"))))
      val joined = tiny.join(ref.select("doc_id", "tier_ref"), Seq("doc_id"))
      assert(joined.where(col("tier") =!= col("tier_ref")).count() == 0, s"trial $trial")
    }
  }

  test("neymanAllocation sums to totalN for random strata shapes") {
    import graft.ops.Stats
    (1 to 3).foreach { trial =>
      val r = new scala.util.Random(trial * 31)
      val rows = (0 until 300).map(i =>
        (s"s${r.nextInt(6)}", r.nextInt(1000) / 7.0))
      val total = 37L + r.nextInt(500)
      val out = Stats.neymanAllocation(
        rows.toDF("stratum", "v"), "stratum", "v", total).collect()
      assert(out.map(_.getLong(3)).sum == total, s"trial $trial")
      assert(out.forall(_.getLong(3) >= 0L))
    }
  }
}

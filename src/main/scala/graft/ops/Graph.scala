package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for crawl curation. Web-scale training-data
  * pipelines rank pages by link centrality before text filters ever
  * run (OPIC/PageRank-style frontier prioritizers in public crawlers;
  * "harmonic centrality" in Common Crawl's public rankings) — this is
  * that signal, computed integer-exact so a SQL oracle can replay it. */
object Graph {

  /** FIXED-POINT PAGERANK, `iters` synchronous power iterations in
    * BIGINT micro-units — deterministic on any engine (no float sum
    * order hazard: every score is an integer, every per-edge
    * contribution is an integer division, and integer addition is
    * associative).
    *
    * Update rule per iteration, damping `d` ppm (default 850000):
    * `score'(v) = (10⁶ − d) + Σ_{u→v} (score(u)·d) div (10⁶·outdeg(u))`
    * over the DISTINCT edge set. Scores start at 10⁶ (= 1.0). Dangling
    * nodes (no out-edges) keep receiving but stop forwarding — their
    * mass leaks rather than redistributes, the simple PageRank variant;
    * ranks are unaffected for sink-free graphs and the leak only
    * deflates absolute values elsewhere (documented, not compensated,
    * to keep the arithmetic pure-integer).
    *
    * Shape — the Pregel shuffle pair, unrolled statically (`iters` is
    * author-sized, 3–10; the loop builds ONE plan, no driver-side data
    * motion): per iteration, scores join edges on src (scores are
    * #nodes-sized — AQE broadcasts them when they fit, turning the
    * corpus-scale side into a map-only probe) then partial-agg on dst.
    * Out-degrees are computed once before the loop. Per-iteration cost
    * is O(|E|) with map-side combine on dst; a mega-in-degree hub is
    * exactly the AQE skew-split case. The loop-invariant inputs — the
    * distinct edge set, the node list, the out-degree table — are
    * persisted for `iters` > 1 (every iteration probes all three; the
    * loop's join key never changes, so without the persist each
    * iteration would re-run the edge distinct from the raw scan —
    * measured 3× the whole query at 3 iterations). MEMORY_AND_DISK:
    * eviction degrades to recompute, never OOM.
    *
    * `seeds` switches to PERSONALIZED PageRank (topic-sensitive,
    * Haveliwala 2002): initial and restart mass confined to the seed
    * node set, scores = link-proximity to the seeds. None = global.
    *
    * Returns (node, score_micro, in_deg, out_deg) ordered by
    * (score_micro desc, node). */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      dampingPpm: Long = 850000L,
      srcCol: String = "src",
      dstCol: String = "dst",
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"pageRank: need iters >= 1, got $iters")
    require(dampingPpm > 0 && dampingPpm < 1000000L,
      s"pageRank: damping must be ppm in (0, 1e6), got $dampingPpm")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d")).distinct()
    val e = if (iters > 1) e0.persist(lvl) else e0
    // PERSONALIZED variant (topic-sensitive PageRank, Haveliwala):
    // `seeds` (a 1-column node set) confines both the initial mass AND
    // the per-iteration restart mass to the seed set — scores become
    // "proximity to the seeds through links". None = uniform/global.
    val nodes0 = e.select(col("_s").as("node"))
      .union(e.select(col("_d").as("node"))).distinct()
    val nodes1 = seeds match {
      case None => nodes0.select(col("node"), lit(1L).as("_seed"))
      case Some(sd) =>
        val s1 = sd.select(col(sd.columns.head).as("node")).distinct()
        nodes0.join(s1.select(col("node"), lit(1L).as("_seed")), Seq("node"), "left")
          .select(col("node"), coalesce(col("_seed"), lit(0L)).as("_seed"))
    }
    val nodes = if (iters > 1) nodes1.persist(lvl) else nodes1
    val outDeg0 = e.groupBy(col("_s").as("node")).agg(count(lit(1)).as("out_deg"))
    val outDeg = if (iters > 1) outDeg0.persist(lvl) else outDeg0
    val inDeg = e.groupBy(col("_d").as("node")).agg(count(lit(1)).as("in_deg"))
    val base = (lit(1000000L) - lit(dampingPpm)) * col("_seed")
    var scores = nodes.select(col("node"),
      (lit(1000000L) * col("_seed")).as("score_micro"))
    for (_ <- 1 to iters) {
      val inbound = scores
        .join(outDeg, Seq("node"))
        .join(e, col("node") === col("_s"))
        .select(col("_d").as("node"),
          expr(s"score_micro * $dampingPpm div (1000000 * out_deg)").as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_in"))
      scores = nodes.join(inbound, Seq("node"), "left")
        .select(col("node"), (base + coalesce(col("_in"), lit(0L))).as("score_micro"))
    }
    scores
      .join(inDeg, Seq("node"), "left")
      .join(outDeg, Seq("node"), "left")
      .select(col("node"), col("score_micro"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .orderBy(col("score_micro").desc, col("node"))
  }

  /** BFS DEPTHS from a seed set, `maxDepth` synchronous frontier
    * rounds — "how many hops is every page from the seed list", the
    * crawl-frontier / link-spam-distance signal ([[pageRank]] scores
    * proximity by mass; this gives the exact hop count).
    *
    * Each round relaxes one hop: `depth'(v) = min(depth(v),
    * min_{u→v} depth(u) + 1)` — a MIN aggregate per round, so the
    * result is deterministic regardless of join order or tie
    * structure. Unreached nodes (within `maxDepth` hops) are absent
    * from the output, not sentinel-valued. Like the PageRank loop the
    * rounds unroll statically and the edge set persists (every round
    * probes it); unlike PageRank each round's frontier table only
    * GROWS to #reachable-nodes, never corpus-sized.
    *
    * Each round's depth table feeds TWO consumers (the expansion join
    * AND the union), so every round persists — the kCorePeel
    * discipline. Without it the logical plan doubles per round
    * (2^maxDepth subtrees); Spark's ReuseExchange happens to collapse
    * the duplicates at execution today, but plan growth must be linear
    * BY CONSTRUCTION, not by optimizer courtesy — the final plan is
    * the SAME constant shape for any maxDepth (PlanSpec-pinned).
    * Registration alone achieves that (the CacheManager substitutes
    * the round's InMemoryRelation into downstream plans at planning
    * time), so no round is eagerly materialized: the terminal action
    * computes each round's cache exactly once, on demand — round 17
    * dropped the per-round count() jobs that used to run inside the
    * timed query.
    *
    * CACHED contract: the returned plan reads the per-round caches and
    * the edge cache — they cannot drop here. The gate harness clears
    * the cache between queries; a library caller invoking bfsDepths
    * repeatedly should do the same (`spark.catalog.clearCache()` or
    * unpersist after the final action) or the round caches accumulate.
    *
    * Returns (node, depth) ordered by (depth, node). */
  def bfsDepths(
      edges: DataFrame,
      seeds: DataFrame,
      maxDepth: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(maxDepth >= 1, s"bfsDepths: need maxDepth >= 1, got $maxDepth")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d")).distinct()
    val e = if (maxDepth > 1) e0.persist(lvl) else e0
    var depths = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .select(col("node"), lit(0L).as("depth"))
    for (_ <- 1 to maxDepth) {
      // persist WITHOUT an eager count: registration alone makes the
      // CacheManager substitute the round's InMemoryRelation into every
      // downstream plan, so plan shape stays constant per round (the
      // PlanSpec pin) while the terminal action materializes each
      // round's cache exactly once, on demand. The old eager
      // count-per-round ran maxDepth extra Spark jobs INSIDE the timed
      // query (their only purpose was to let the previous round
      // unpersist safely); keeping all rounds cached until the harness
      // reap costs #reachable-nodes × maxDepth rows of storage and
      // saves the barriers.
      val cur = depths.persist(lvl)
      val next = cur.join(e, col("node") === col("_s"))
        .select(col("_d").as("node"), (col("depth") + 1L).as("depth"))
      depths = cur.union(next)
        .groupBy("node").agg(min(col("depth")).as("depth"))
    }
    // the last round's cache is still read by the returned lazy plan;
    // the harness clears persistent RDDs between queries (same
    // contract as the persisted edge table above)
    depths.orderBy("depth", "node")
  }

  /** PER-NODE TRIANGLE COUNTS over an UNDIRECTED graph — the local
    * clustering signal (spam farms and boilerplate link rings are
    * triangle-dense; organic link neighborhoods are sparse), and the
    * classic "does your join strategy survive a power-law graph" test.
    *
    * Algorithm: degree-ordered orientation (the Cohen / "forward"
    * method, public since Schank-Wagner 2005). Edges normalize to
    * distinct unordered pairs (self-loops dropped), then each edge is
    * DIRECTED from the endpoint with the smaller (degree, node) key to
    * the larger — a total acyclic orientation under which every
    * triangle is counted EXACTLY ONCE as (a→b, a→c, b→c) with b before
    * c in key order. Each node's out-degree under orientation is
    * O(√m), so wedge enumeration (the self-join on the source) is
    * Σ C(outdeg, 2) = O(m^1.5) worst-case instead of Σ C(deg, 2),
    * which a power-law hub would blow up quadratically — THE reason
    * plain wedge counting dies on web graphs and this doesn't.
    *
    * Shape: two partial-agg passes for degrees, one equi-join to
    * orient, the wedge self-join on the oriented source key, and one
    * single-long-key equi-join (xxhash64(b,c), equality-verified) of
    * wedges against oriented edges to close them; per-triangle
    * attribution explodes 3 rows and partial-aggs on the node. All
    * joins are equi-joins on node keys — shuffle or broadcast by AQE's
    * choice, skew-splittable. The oriented edge set is consumed THREE
    * times (both wedge sides + the closing probe), so it is persisted
    * (MEMORY_AND_DISK — eviction degrades to recompute) pre-partitioned
    * and sorted on the wedge key: without it the raw-edge distinct +
    * degree joins re-run per consumer, and without the pre-shape every
    * run pays two exchanges + two sorts to feed the self-join.
    *
    * Returns (node, n_triangles, n_total) for triangle-participating
    * nodes, n_total the global triangle count (one window over the
    * node-bounded result), ordered by (n_triangles desc, node). */
  def triangleCount(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // persist: the (possibly expensive) upstream edge derivation +
    // distinct feeds BOTH the degree count and the orientation join —
    // uncached, Catalyst materializes each subplan independently and
    // the producer runs three times (measured 8.3 s → the distinct runs
    // once here). Unpersisted by the final action's GC; Bench/Verify
    // clear persistent RDDs between queries.
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .where(col("_a") =!= col("_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one scan: explode both endpoints instead of a 2-scan union
    val deg = und.select(explode(array(col("_a"), col("_b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_deg"))
    // orient by (deg, node): src = smaller key. Each side carries its
    // key so wedge endpoints can be ordered without another deg join.
    // The (deg, node) key rides as TWO primitive columns, not a struct:
    // the wedge join's non-equi condition runs once per same-src pair —
    // Σ outdeg² ≈ 143M evaluations at sf0.1 — and a lexicographic pair
    // of primitive comparisons codegens to plain long compares where
    // the struct LessThan went through the generic ordering.
    val aFirst = struct(col("_da"), col("_a")) < struct(col("_db"), col("_b"))
    val oriented0 = und
      .join(deg.select(col("node").as("_a"), col("_deg").as("_da")), Seq("_a"))
      .join(deg.select(col("node").as("_b"), col("_deg").as("_db")), Seq("_b"))
      .select(
        when(aFirst, col("_a")).otherwise(col("_b")).as("src"),
        when(aFirst, col("_b")).otherwise(col("_a")).as("dst"),
        when(aFirst, col("_db")).otherwise(col("_da")).as("_dd"))
    // persist PRE-SHAPED for the wedge self-join (round-18): hash-
    // partitioned and sorted by src, so both SMJ sides read the cached
    // layout with NO exchange and NO sort per consumer (guide §2.4 —
    // two operations keyed the same way share one partitioning; with
    // `canChangeCachedPlanOutputPartitioning` at its default the cached
    // plan's partitioning is stable and advertised). One extra exchange
    // at cache-build time replaces two exchanges + two sorts on every
    // execution — at scale that is a full edge-set shuffle per run.
    val oriented = oriented0
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (x._dd, x.dst) < (y._dd, y.dst) — the same total order the struct
    // key gave, spelled as primitive comparisons
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.src") === col("y.src") &&
          (col("x._dd") < col("y._dd") ||
            (col("x._dd") === col("y._dd") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("a"), col("x.dst").as("b"), col("y.dst").as("c"))
    // Closing probe on ONE long key (round-18): joining on Seq("b","c")
    // built a generic two-column UnsafeHashedRelation, and the ~41M-
    // wedge probe stream (sf0.1) spent ~3.5 of the op's 4.7 s hashing
    // and chain-comparing two-field row keys — measured by stage: the
    // wedge SMJ alone is ~1.1 s, attribution ~0.1 s, the probe the
    // rest. Keying the join on xxhash64(b, c) gives a dense
    // LongHashedRelation; exactness is restored by the equality verify
    // on (b, c) — wrapped in coalesce(..., false) so the planner keeps
    // it a post-join filter instead of folding it back into the key
    // extraction (both sides are non-null by construction: they come
    // from inner joins over the distinct edge set). Hash collisions
    // only cost a filtered row, never a wrong count. A/B: 4.7 → 3.3 s
    // warm, byte-identical output.
    val closing = oriented.select(
      xxhash64(col("src"), col("dst")).as("_hk"),
      col("src").as("_cb"), col("dst").as("_cc"))
    val tris = wedges.join(closing,
        xxhash64(col("b"), col("c")) === col("_hk") &&
          coalesce(col("b") === col("_cb"), lit(false)) &&
          coalesce(col("c") === col("_cc"), lit(false)))
      .select(col("a"), col("b"), col("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .withColumn("n_total",
        (sum(col("n_triangles")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()) / 3L).cast("long"))
      .orderBy(col("n_triangles").desc, col("node"))
  }

  /** DEGREE ASSORTATIVITY — the Pearson correlation of endpoint degrees
    * over the (symmetrized) edge list: positive = hubs link to hubs
    * (social graphs), negative = hubs link to leaves (the web,
    * near-dup star clusters — which is why it pairs with
    * [[modularityByLabel]] on dedup graphs: high modularity + negative
    * assortativity reads "template hub with satellite variants").
    * Newman 2002's r, computed over BOTH edge directions (the standard
    * undirected convention).
    *
    * Integer degrees from one partial-agg count; the correlation uses
    * exact DECIMAL(38,0) moments with the [[graft.ops.Stats
    * .correlationMatrix]] float policy (round-6 tail, fixed operand
    * order). Work ∝ edges; returns ONE row (n_edges, r). */
  def assortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val und = edges.select(
        least(col("a"), col("b")).as("_a"), greatest(col("a"), col("b")).as("_b"))
      .where(col("_a") =!= col("_b")).distinct()
    val deg = und.select(explode(array(col("_a"), col("_b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_deg"))
    val sym = und.select(col("_a").as("x"), col("_b").as("y"))
      .unionByName(und.select(col("_b").as("x"), col("_a").as("y")))
    sym
      .join(deg.select(col("node").as("x"), col("_deg").as("_dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("_deg").as("_dy")), Seq("y"))
      .agg(count(lit(1)).as("_n"),
        sum(col("_dx").cast(d)).as("_sx"), sum(col("_dy").cast(d)).as("_sy"),
        sum(col("_dx").cast(d) * col("_dx").cast(d)).as("_sxx"),
        sum(col("_dy").cast(d) * col("_dy").cast(d)).as("_syy"),
        sum(col("_dx").cast(d) * col("_dy").cast(d)).as("_sxy"))
      .selectExpr("CAST(_n div 2 AS BIGINT) AS n_edges",
        "CASE WHEN CAST(_n AS DECIMAL(38,0)) * _sxx - _sx * _sx = 0 " +
          "OR CAST(_n AS DECIMAL(38,0)) * _syy - _sy * _sy = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(CAST(CAST(_n AS DECIMAL(38,0)) * _sxy - _sx * _sy AS DOUBLE) / " +
          "sqrt(CAST(CAST(_n AS DECIMAL(38,0)) * _sxx - _sx * _sx AS DOUBLE) * " +
          "CAST(CAST(_n AS DECIMAL(38,0)) * _syy - _sy * _sy AS DOUBLE)), 6) + 0.0 END AS r")
  }

  /** MODULARITY of a node labeling over an undirected edge list — "how
    * much denser are within-label edges than a degree-preserving random
    * rewiring expects" (Newman's Q): the quantitative answer to "do my
    * near-duplicates stay inside their language / source / cluster?".
    * Q = Σ_c [e_c/m − (d_c/2m)²]; reported PER LABEL as the exact
    * integer decomposition e_c, d_c plus the re-signed ppm contribution
    * (4m·e_c − d_c²) / 4m² — summing q_contrib_ppm gives Q·1e6 up to
    * per-term truncation. Nodes with no incident edge carry no degree
    * and are excluded (they cannot affect Q); an edge whose endpoint is
    * missing from `labels` groups under the NULL label rather than
    * vanishing — a labeling hole should be loud.
    *
    * Shape: degrees are one partial-agg count off the exploded endpoint
    * stream; labels join once per endpoint (broadcast when the label
    * table is small, as a dim table usually is); every Q term folds
    * over the |labels|-bounded summary against a 1-row broadcast m.
    * At 100 TB the work is ∝ edges, parallelism = #nodes then #labels.
    *
    * Returns (label, n_nodes, degree_sum, intra_edges, q_contrib_ppm)
    * ordered by label. */
  def modularityByLabel(
      edges: DataFrame,
      labels: DataFrame,
      nodeCol: String = "node",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val lab = labels.select(col(nodeCol).as("_n"), col(labelCol).as("_l"))
    val la = lab.select(col("_n").as("a"), col("_l").as("_la"))
    val lb = lab.select(col("_n").as("b"), col("_l").as("_lb"))
    val e = edges.select("a", "b")
      .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
    val m = e.agg(count(lit(1)).cast(d).as("_m"))
    val intra = e.where(col("_la") <=> col("_lb"))
      .groupBy(col("_la").as("_l")).agg(count(lit(1)).as("intra_edges"))
    val deg = e.select(explode(array(
        struct(col("a").as("_n"), col("_la").as("_l")),
        struct(col("b").as("_n"), col("_lb").as("_l")))).as("_e"))
      .select(col("_e._n").as("_n"), col("_e._l").as("_l"))
      .groupBy(col("_n"), col("_l")).agg(count(lit(1)).as("_d"))
      .groupBy(col("_l"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("_d")).as("degree_sum"))
    deg.join(intra, Seq("_l"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .selectExpr("_l AS label", "n_nodes", "degree_sum", "intra_edges",
        // re-signed magnitude div: Spark div truncates, DuckDB // floors;
        // they agree only on non-negative operands
        "CAST(CASE WHEN 4 * _m * CAST(intra_edges AS DECIMAL(38,0)) - " +
          "CAST(degree_sum AS DECIMAL(38,0)) * CAST(degree_sum AS DECIMAL(38,0)) >= 0 " +
          "THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(abs(4 * _m * CAST(intra_edges AS DECIMAL(38,0)) - " +
          "CAST(degree_sum AS DECIMAL(38,0)) * CAST(degree_sum AS DECIMAL(38,0))) * 1000000 " +
          "div (4 * _m * _m) AS BIGINT) AS q_contrib_ppm")
      .orderBy("label")
  }

  /** K-CORE PEEL, `rounds` synchronous rounds — the dense-subgraph
    * screen (community cores, bot rings, "real" co-purchase backbones):
    * repeatedly drop every node whose degree among survivors is < k;
    * the fixpoint is Seidman's k-core. `rounds` is author-sized
    * (3–10) like [[pageRank]]'s iters: each round strictly shrinks or
    * the fixpoint is already reached, and round r ≥ the true core —
    * the result converges FROM ABOVE, never drops a true core member.
    * The loop builds ONE plan (no driver-side data motion).
    *
    * Shape per round: one partial-agg degree count (node-sized) and two
    * LEFT-SEMI joins restricting the edge list — both on the node key;
    * survivors of the last round are re-counted once for the reported
    * in-core degree. Work ∝ surviving edges per round, monotone
    * non-increasing. Returns (node, deg) for nodes alive after
    * `rounds` peels, node-ordered.
    *
    * LINEAGE NOTE: rounds persist lazily (no eager materialization —
    * the terminal action computes each round's cache once, on demand),
    * so the LOGICAL plan references the previous round ~3× per round
    * and grows 3^rounds before cache substitution. Fine at the
    * author-sized 3–5 rounds this engine ships; a caller pushing
    * `rounds` past that should checkpoint every few rounds (see
    * connectedComponents for the data-dependent-round protocol and the
    * measured cost of getting this wrong). */
  def kCorePeel(
      edges: DataFrame,
      k: Int,
      rounds: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"kCorePeel: need k >= 1, got $k")
    require(rounds >= 1, s"kCorePeel: need rounds >= 1, got $rounds")
    // each round's edge list feeds TWO consumers (the degree count and
    // the semi-join restriction) — unpersisted, the whole prefix of the
    // plan re-executes once per consumer per round (2^rounds source
    // scans; measured 7.9 s → sub-second at sf0.1 with the persist)
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .where(col("_a") =!= col("_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("_a"), col("_b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("node")
      // persist WITHOUT the eager count-then-unpersist: registration
      // alone routes both of next round's consumers (the degree count
      // and the semi-join restriction) through this round's
      // InMemoryRelation, and the terminal action materializes each
      // round once, on demand. The old eager count ran `rounds` extra
      // Spark jobs INSIDE the timed query purely so the previous
      // round's cache could drop early; keeping all rounds cached
      // until the harness reap costs ≤ rounds × |edges| rows of
      // storage (monotone non-increasing per round) and saves the
      // per-round job barriers.
      e = e
        .join(keep.withColumnRenamed("node", "_a"), Seq("_a"), "left_semi")
        .join(keep.withColumnRenamed("node", "_b"), Seq("_b"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val out = e.select(explode(array(col("_a"), col("_b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .orderBy("node")
    out
  }

  /** STRUCTURAL LINK PREDICTION over an undirected graph — for every
    * unlinked node pair at distance 2, the three classic neighborhood
    * scores (Liben-Nowell & Kleinberg 2003), all INTEGER so any engine
    * replays them exactly:
    *   - `cn`           — |N(a) ∩ N(b)|, common-neighbor count;
    *   - `jaccard_ppm`  — cn·10⁶ div |N(a) ∪ N(b)|;
    *   - `ra_ppm`       — Σ_{z ∈ common} (10⁶ div deg(z)), the
    *     resource-allocation index with each reciprocal an INTEGRAL
    *     division (no float sum-order hazard; a z shared via a huge hub
    *     contributes 0, which is exactly RA's point).
    *
    * Shape: candidate pairs are generated ONLY through shared
    * neighbors — adjacency self-joined on the center z (an equi-join;
    * never all-pairs), partial-agg'd on (a, b). deg(z) rides the
    * adjacency rows via one equi-join ON THE SAME KEY z, so AQE reuses
    * the exchange into the wedge join. Linked pairs leave via a
    * left-anti join on the canonical edge set; endpoint degrees come
    * back through two node-keyed joins. Output is the top-`topK` by
    * (cn desc, ra_ppm desc, a, b) — TakeOrdered, no global sort.
    *
    * 100 TB: a degree-D hub z emits D² wedge rows — the same quadratic
    * a PPJoin prefix hits; the relief valve is the `degCap` ceiling
    * (drop centers with deg(z) > cap before the self-join). Loss
    * contract, pinned by spec on a planted hub: a dropped center z
    * contributed exactly `10⁶ div deg(z) ≤ 10⁶/cap` to each of its
    * pairs' ra_ppm — RA ranking loss ≤ cap⁻¹·10⁶ ppm per dropped hub —
    * while cn/jaccard become "among sub-cap neighbors" (which is RA's
    * own point: hub evidence is near-worthless). Endpoint degrees deg_a
    * / deg_b stay UNCAPPED, so with a cap at or above every degree the
    * output is identical to the unguarded path (gated: p276). Off by
    * default — gate graphs are hub-light.
    *
    * Returns (a, b, cn, deg_a, deg_b, jaccard_ppm, ra_ppm). */
  def linkPrediction(
      edges: DataFrame,
      topK: Int = 50,
      srcCol: String = "src",
      dstCol: String = "dst",
      degCap: Option[Long] = None): DataFrame = {
    require(topK >= 1, s"linkPrediction: need topK >= 1, got $topK")
    require(degCap.forall(_ >= 1L), s"linkPrediction: degCap must be >= 1, got $degCap")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .where(col("_a") =!= col("_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // symmetric adjacency in one scan: explode both orientations
    val adj = und.select(explode(array(
        struct(col("_a").as("z"), col("_b").as("n")),
        struct(col("_b").as("z"), col("_a").as("n")))).as("_e"))
      .select(col("_e.z").as("z"), col("_e.n").as("n"))
    val deg = adj.groupBy(col("z").as("node")).agg(count(lit(1)).as("deg"))
    // deg(z) onto each adjacency row: same join key as the wedge join;
    // the degCap valve drops hub CENTERS here, before the self-join —
    // endpoint degree reporting below stays uncapped
    val adjZall = adj.join(deg.withColumnRenamed("node", "z"), Seq("z"))
    val adjZ = degCap.map(c => adjZall.where(col("deg") <= c)).getOrElse(adjZall)
    val cand = adjZ.as("x")
      .join(adjZ.as("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("_a"), col("y.n").as("_b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("CAST(1000000 div x.deg AS BIGINT)")).as("ra_ppm"))
      .join(und, Seq("_a", "_b"), "left_anti")
    cand
      .join(deg.select(col("node").as("_a"), col("deg").as("deg_a")), Seq("_a"))
      .join(deg.select(col("node").as("_b"), col("deg").as("deg_b")), Seq("_b"))
      .select(col("_a").as("a"), col("_b").as("b"), col("cn"),
        col("deg_a"), col("deg_b"),
        expr("CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)")
          .as("jaccard_ppm"),
        col("ra_ppm"))
      .orderBy(col("cn").desc, col("ra_ppm").desc, col("a"), col("b"))
      .limit(topK)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order/basket analytics: association rules over line items and
  * customer-value segmentation — the classic retail pair to the
  * behavioral ops in [[EventsOps]]. All outputs are integer-exact
  * (counts + ppm ratios by integer division), so a SQL oracle matches
  * bit-for-bit. */
object Retail {

  /** MARKET-BASKET LIFT (association-rule mining, the support /
    * confidence / lift triple of Agrawal-Srikant Apriori at pair
    * depth): for every unordered item pair bought together in at least
    * `minPairCount` baskets, how much MORE often they co-occur than
    * independence predicts.
    *
    * Baskets are the distinct (basket, item) projection; pairs come
    * from a self-equi-join ON THE BASKET KEY with `item_a < item_b`
    * (each basket contributes C(|basket|, 2) pairs — never an
    * all-pairs item join). Basket size bounds the blow-up: order
    * baskets are naturally small (TPC-H ≤ 7 lines); for 100 TB retail
    * data with pathological mega-baskets, cap basket size upstream
    * (drop or sample baskets over ~10³ items — a mega-basket is
    * signal-free for pair mining anyway) and let AQE split any
    * residual hot basket key. Item counts ride a second partial agg on
    * the same projection; both joins after it are |items|- and
    * |pairs|-bounded.
    *
    * Integer contract: `support_ppm = c_ab·10⁶ div N`,
    * `confidence_ppm = c_ab·10⁶ div c_a` (directional a→b),
    * `lift_ppm = c_ab·N·10⁶ div (c_a·c_b)` — lift > 10⁶ means
    * positively associated. Counts fit HUGEINT/BIGINT ranges:
    * c_ab·N·10⁶ < 2⁶³ up to ~3·10⁶ baskets with c_ab ≤ N; beyond
    * that widen to DECIMAL(38,0) like the CUSUM op.
    *
    * Returns (item_a, item_b, n_ab, n_a, n_b, support_ppm,
    * confidence_ppm, lift_ppm) with item_a < item_b, ordered by
    * (n_ab desc, item_a, item_b). */
  def basketLift(
      lines: DataFrame,
      basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey",
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"basketLift: need minPairCount >= 1, got $minPairCount")
    // persist: the distinct (basket, item) projection feeds FOUR
    // consumers (both self-join sides, the item counts, the basket
    // count) — uncached the distinct's shuffle re-runs per consumer
    // (exchange reuse only covers the identical x/y subplans).
    // Unpersisted by the action's GC, same idiom as tripleItemsets.
    val items = lines.select(col(basketCol).as("_b"), col(itemCol).as("_i")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = items.select(col("_b")).distinct()
      .agg(count(lit(1)).as("_n"))
    val itemCnt = items.groupBy(col("_i")).agg(count(lit(1)).as("_c"))
    val pairs = items.as("x")
      .join(items.as("y"), col("x._b") === col("y._b") && col("x._i") < col("y._i"))
      .groupBy(col("x._i").as("item_a"), col("y._i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(itemCnt.select(col("_i").as("item_a"), col("_c").as("n_a")), Seq("item_a"))
      .join(itemCnt.select(col("_i").as("item_b"), col("_c").as("n_b")), Seq("item_b"))
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000000 div _n").as("support_ppm"),
        expr("n_ab * 1000000 div n_a").as("confidence_ppm"),
        expr("n_ab * _n * 1000000 div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
  }

  /** CO-PURCHASE RECOMMENDATIONS: for every item, the top-`k` other
    * items by association lift — [[basketLift]]'s pair table turned
    * DIRECTIONAL (each unordered pair feeds both directions, with
    * confidence re-based on the direction's antecedent) and cut to a
    * per-item top-k. The "customers who bought X also bought" table.
    *
    * Ranking is (lift desc, n_ab desc, rec asc) — fully tie-broken, so
    * the cut is deterministic on any engine. The window runs over the
    * |pairs|-bounded directional table (never the basket stream), and
    * the rank cut gets Spark's partial WindowGroupLimit below the
    * exchange — each map task pre-prunes to its local top-k.
    *
    * Returns (item, rec, n_ab, confidence_ppm, lift_ppm, rank ≤ k)
    * ordered by (item, rank). */
  def itemRecs(
      lines: DataFrame,
      basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey",
      minPairCount: Long = 2L,
      k: Int = 3): DataFrame =
    itemRecsFromPairs(basketLift(lines, basketCol, itemCol, minPairCount), k)

  /** [[itemRecs]] over an ALREADY-COMPUTED [[basketLift]] pair table —
    * the composition seam: a session that publishes both the pair
    * report and the rec table computes the basket join once. */
  def itemRecsFromPairs(pairs: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"itemRecs: need k >= 1, got $k")
    val directional = pairs.select(
        col("item_a").as("item"), col("item_b").as("rec"), col("n_ab"),
        expr("n_ab * 1000000 div n_a").as("confidence_ppm"), col("lift_ppm"))
      .union(pairs.select(
        col("item_b").as("item"), col("item_a").as("rec"), col("n_ab"),
        expr("n_ab * 1000000 div n_b").as("confidence_ppm"), col("lift_ppm")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("lift_ppm").desc, col("n_ab").desc, col("rec").asc)
    directional
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("item", "rank")
  }

  /** RFM SEGMENTATION: score every customer 1–4 on Recency (days since
    * their last order, relative to the dataset's global last order
    * date), Frequency (order count) and Monetary (lifetime spend), by
    * quartile — the classic customer-value grid, integer end to end.
    *
    * Quartiles are `ntile(4)` over a TOTAL order (metric, then
    * customer key as tie-break) — ntile's bucket boundaries depend
    * only on row rank and n, so with the tie-broken total order the
    * assignment is engine-independent even where metric values tie.
    * Recency orders ASCENDING days (most recent first ⇒ score 1 =
    * best recency quartile); frequency and monetary order DESCENDING
    * (score 1 = top spenders/most orders). Spend is BIGINT cents
    * (`floor(price·100)` per order, summed — floor before sum, so the
    * sum is an exact integer on any engine). Order dates are epoch
    * DAYS by the shared floor(double) idiom (timestamp column, second
    * resolution — the day boundary is UTC midnight).
    *
    * Shape: one partial agg on the customer key, a 1-row global-max
    * cross join, then three ntile windows over the #customers-sized
    * aggregate — corpus-scale work is the first agg only; the window
    * input is customer-bounded. The un-partitioned ntile windows
    * single-task at extreme customer counts — beyond ~10⁸ customers
    * swap ntile for a percentile_approx cut table (same scores, two
    * passes), as the scaladoc'd quantile ops do.
    *
    * Returns (custkey, recency_days, n_orders, spend_cents, r, f, m,
    * rfm — e.g. "1-4-2") ordered by custkey. */
  def rfmSegments(
      orders: DataFrame,
      custCol: String = "o_custkey",
      dateCol: String = "o_orderdate",
      priceCol: String = "o_totalprice"): DataFrame = {
    val perCust = orders.select(col(custCol).as("custkey"),
        floor(floor(unix_micros(col(dateCol)).cast("double") / lit(1000000.0d)) /
          lit(86400.0d)).cast("long").as("_d"),
        floor(col(priceCol).cast("double") * lit(100.0d)).cast("long").as("_cents"))
      .groupBy(col("custkey"))
      .agg(max(col("_d")).as("_last"),
        count(lit(1)).as("n_orders"),
        sum(col("_cents")).as("spend_cents"))
    val globalLast = perCust.agg(max(col("_last")).as("_gmax"))
    perCust.crossJoin(globalLast)
      .withColumn("recency_days", col("_gmax") - col("_last"))
      // #customers-bounded aggregate rides these three global ntiles;
      // Scaladoc contract: beyond ~1e8 customers swap for quantile cuts
      .withColumn("r", ntile(4).over(
        Window.orderBy(col("recency_days").asc, col("custkey").asc)))
      .withColumn("f", ntile(4).over(
        Window.orderBy(col("n_orders").desc, col("custkey").asc)))
      .withColumn("m", ntile(4).over(
        Window.orderBy(col("spend_cents").desc, col("custkey").asc)))
      .select(col("custkey"), col("recency_days"), col("n_orders"),
        col("spend_cents"), col("r").cast("long").as("r"),
        col("f").cast("long").as("f"), col("m").cast("long").as("m"),
        concat_ws("-", col("r"), col("f"), col("m")).as("rfm"))
      .orderBy("custkey")
  }

  /** NET / GROSS REVENUE RETENTION by quarter — the SaaS board metric
    * pair: of the revenue customers generated LAST quarter, how much
    * did the SAME customers generate this quarter (NRR — expansion
    * counts), and how much survived without counting expansion (GRR —
    * each customer capped at their previous level)? GRR ≤ GRR-cap ≤
    * NRR by construction; NRR > 10⁶ means expansion outruns churn.
    *
    * Integer-exact: quarters are `year·4 + (month−1) div 3` (calendar
    * integers both engines agree on), revenue micro; ONE (customer,
    * quarter) partial agg, then a customer-keyed self-join onto
    * quarter+1 (left — churned customers contribute 0), per-quarter
    * sums, ratios as single integral ppm divisions. Returns
    * (quarter, n_base_customers, base_rev_micro, retained_rev_micro,
    * capped_rev_micro, nrr_ppm, grr_ppm) for each quarter with a
    * preceding base, quarter-ordered. */
  def revenueRetention(
      orders: DataFrame,
      custCol: String = "o_custkey",
      dateCol: String = "o_orderdate",
      amountCol: String = "o_totalprice"): DataFrame = {
    val q = (year(col(dateCol)) * 4 +
      expr(s"CAST((month($dateCol) - 1) div 3 AS INT)")).cast("long")
    val cq = orders
      .where(col(amountCol).isNotNull)
      .groupBy(col(custCol).as("_c"), q.as("_q"))
      .agg(sum(floor(col(amountCol).cast("double") * lit(1000000.0d))
        .cast("long")).as("_rev"))
    val prev = cq.select(col("_c"), (col("_q") + 1).as("quarter"),
      col("_rev").as("_base"))
    val cur = cq.select(col("_c"), col("_q").as("quarter"),
      col("_rev").as("_cur"))
    prev.join(cur, Seq("_c", "quarter"), "left")
      .withColumn("_cur", coalesce(col("_cur"), lit(0L)))
      // report only OBSERVED quarters — the snapshot's last quarter has
      // no successor data, and a fake all-churn row would be noise
      .join(cq.select(col("_q").as("quarter")).distinct(), Seq("quarter"), "left_semi")
      .groupBy(col("quarter"))
      .agg(count(lit(1)).as("n_base_customers"),
        sum(col("_base")).as("base_rev_micro"),
        sum(col("_cur")).as("retained_rev_micro"),
        sum(least(col("_cur"), col("_base"))).as("capped_rev_micro"))
      .withColumn("nrr_ppm", expr(
        "CAST(CAST(retained_rev_micro AS DECIMAL(38,0)) * 1000000 " +
          "div base_rev_micro AS BIGINT)"))
      .withColumn("grr_ppm", expr(
        "CAST(CAST(capped_rev_micro AS DECIMAL(38,0)) * 1000000 " +
          "div base_rev_micro AS BIGINT)"))
      .orderBy("quarter")
  }

  /** ABC (PARETO) CLASSIFICATION — the inventory-policy workhorse:
    * items ranked by revenue, classed A while the cumulative share
    * stays ≤ `aCutPpm`, B to `bCutPpm`, else C (the first item whose
    * cumulative share crosses a boundary lands in the NEXT class — the
    * declared convention; conventions differ and hiding one in float
    * comparisons is how two reports disagree).
    *
    * Integer-exact: revenue in micro, cumulative share as ONE integral
    * ppm division per row over the (revenue desc, item) total order.
    * The catalog-sized unpartitioned window follows the rfmSegments
    * contract (swap for a two-pass prefix sum past ~10⁸ items).
    * Returns (item, revenue_micro, cum_share_ppm, abc_class),
    * rank-ordered. */
  def abcClassification(
      lines: DataFrame,
      aCutPpm: Long = 800000L,
      bCutPpm: Long = 950000L,
      itemCol: String = "l_partkey",
      revCol: String = "l_extendedprice"): DataFrame = {
    require(0 < aCutPpm && aCutPpm < bCutPpm && bCutPpm <= 1000000L,
      s"abcClassification: need 0 < aCut < bCut <= 1e6, got $aCutPpm/$bCutPpm")
    val per = lines
      .where(col(revCol).isNotNull)
      .groupBy(col(itemCol).as("item"))
      .agg(sum(floor(col(revCol).cast("double") * lit(1000000.0d)).cast("long"))
        .as("revenue_micro"))
    // |items|-bounded cum ladder (post-aggregate, not corpus rows)
    val wCum = Window.orderBy(col("revenue_micro").desc, col("item").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    per
      .withColumn("_cum", sum(col("revenue_micro")).over(wCum))
      .withColumn("_tot", sum(col("revenue_micro")).over(wAll))
      .withColumn("cum_share_ppm", expr(
        "CAST(CAST(_cum AS DECIMAL(38,0)) * 1000000 div _tot AS BIGINT)"))
      .withColumn("abc_class",
        when(col("cum_share_ppm") <= aCutPpm, "A")
          .when(col("cum_share_ppm") <= bCutPpm, "B")
          .otherwise("C"))
      .select("item", "revenue_micro", "cum_share_ppm", "abc_class")
      .orderBy(col("revenue_micro").desc, col("item").asc)
  }

  /** NEW-ITEM REVENUE SHARE per week — the assortment-freshness curve
    * merchandising watches: how much of each week's revenue comes from
    * items first sold THAT week? A share that never decays means the
    * catalog churns; one that collapses to 0 means the long tail died.
    *
    * Integer-exact: weeks are ⌊epoch-day/7⌋ (the shared floor idiom),
    * revenue in micro; an item's debut week is one partial agg MIN;
    * the weekly roll-up joins sales to debuts on the item key and
    * splits revenue by `week == debut`. share ppm = one integral
    * division of non-negative sums. Returns (week, n_items, n_new_items,
    * revenue_micro, new_revenue_micro, new_share_ppm), week-ordered. */
  def newItemShare(
      lines: DataFrame,
      orders: DataFrame): DataFrame = {
    def week(c: Column): Column =
      floor(floor(floor(unix_micros(c).cast("double") / lit(1000000.0d)) /
        lit(86400.0d)) / lit(7.0d)).cast("long")
    val sales = lines
      .select(col("l_orderkey"), col("l_partkey"),
        floor(col("l_extendedprice").cast("double") * lit(1000000.0d))
          .cast("long").as("_rev"))
      .join(orders.select(col("o_orderkey"), week(col("o_orderdate")).as("_w")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("_p"), col("_w"), col("_rev"))
    val debut = sales.groupBy(col("_p")).agg(min(col("_w")).as("_dw"))
    sales.join(debut, Seq("_p"))
      .groupBy(col("_w").as("week"))
      .agg(countDistinct(col("_p")).as("n_items"),
        countDistinct(when(col("_dw") === col("_w"), col("_p"))).as("n_new_items"),
        sum(col("_rev")).as("revenue_micro"),
        sum(when(col("_dw") === col("_w"), col("_rev")).otherwise(0L))
          .as("new_revenue_micro"))
      .withColumn("new_share_ppm", expr(
        "CAST(CAST(new_revenue_micro AS DECIMAL(38,0)) * 1000000 " +
          "div revenue_micro AS BIGINT)"))
      .orderBy("week")
  }

  /** FULFILLMENT-LAG LADDER by order priority — "do urgent orders
    * actually ship faster?": calendar days from order date to the
    * order's FIRST line shipment, summarized per priority as exact
    * rank-based quantiles (value at rank ⌈q·n⌉ of the (lag, key) total
    * order — the integer-exact lower quantile, no interpolation).
    *
    * Shape: one partial agg collapses lines to per-order first-ship;
    * one order-keyed join; ONE priority exchange carries both the rank
    * and count windows. Lag in whole epoch days (the shared floor
    * idiom per timestamp, then integer difference). Returns
    * (priority, n_orders, p50_days, p90_days, max_days),
    * priority-ordered. */
  def fulfillmentLag(
      orders: DataFrame,
      lines: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def epochDay(c: Column): Column =
      floor(floor(unix_micros(c).cast("double") / lit(1000000.0d)) /
        lit(86400.0d)).cast("long")
    val firstShip = lines.groupBy(col("l_orderkey"))
      .agg(min(col("l_shipdate")).as("_ship"))
    val lag = orders
      .join(firstShip, orders("o_orderkey") === firstShip("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        (epochDay(col("_ship")) - epochDay(col("o_orderdate"))).as("_lag"),
        col("o_orderkey").as("_k"))
    val w = Window.partitionBy(col("priority")).orderBy(col("_lag"), col("_k"))
    val wn = Window.partitionBy(col("priority"))
    lag
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wn))
      .groupBy(col("priority"))
      .agg(max(col("_n")).as("n_orders"),
        max(when(col("_rn") === expr("CAST((_n + 1) div 2 AS INT)"), col("_lag")))
          .as("p50_days"),
        max(when(col("_rn") === expr("CAST((9 * _n + 9) div 10 AS INT)"), col("_lag")))
          .as("p90_days"),
        max(col("_lag")).as("max_days"))
      .orderBy("priority")
  }

  /** RECOMMENDATION BACKTEST — the honest evaluation loop every rec
    * table needs before anyone trusts it: train the [[itemRecs]]
    * co-occurrence model on pre-`cutDate` baskets only, recommend the
    * top-k unseen co-items of each customer's training profile, and
    * score against what the customer actually bought AFTER the cut
    * (out-of-time, the p241 calibration convention). A customer counts
    * as scored when the model produced ≥ 1 novel recommendation and
    * they had post-cut activity; a hit is ≥ 1 recommended item among
    * their post-cut purchases.
    *
    * Shape: one basket join per period, the bounded rec table
    * broadcast-joins back onto customer profiles, every metric is a
    * semi-join + count — no per-customer arrays, no collect. All
    * counts integers; rate = integral ppm. Returns ONE row
    * (n_eval_customers, n_scored, n_hits, hit_rate_ppm). */
  def recBacktest(
      lines: DataFrame,
      orders: DataFrame,
      cutDate: String = "1997-01-01",
      minPairCount: Long = 2L,
      k: Int = 3): DataFrame = {
    val joined = lines.select(col("l_orderkey"), col("l_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("_b"), col("l_partkey").as("_i"),
        col("o_custkey").as("_cust"), col("o_orderdate").as("_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cut = lit(cutDate).cast("date")
    val train = joined.where(col("_d") < cut)
    val evalP = joined.where(col("_d") >= cut)
    val recs = itemRecs(
        train.select(col("_b").as("l_orderkey"), col("_i").as("l_partkey")),
        "l_orderkey", "l_partkey", minPairCount, k)
      .select(col("item"), col("rec"))
    // prof feeds three consumers (the rec join, the novelty anti-join,
    // the eval-customer semi-join) and custRecs/evalItems two each —
    // persist all three so the single final action computes each
    // distinct shuffle once instead of per metric branch
    val prof = train.select(col("_cust"), col("_i").as("item")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val custRecs = prof.join(broadcast(recs), Seq("item"))
      .select(col("_cust"), col("rec")).distinct()
      .join(prof.select(col("_cust"), col("item").as("rec")),
        Seq("_cust", "rec"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalItems = evalP.select(col("_cust"), col("_i").as("rec")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalCusts = evalItems.select("_cust").distinct()
      .join(prof.select("_cust").distinct(), Seq("_cust"), "left_semi")
    val scoredCusts = custRecs.select("_cust").distinct()
      .join(evalCusts, Seq("_cust"), "left_semi")
    val hitCusts = custRecs.join(evalItems, Seq("_cust", "rec"), "left_semi")
      .select("_cust").distinct()
    evalCusts.agg(count(lit(1)).as("n_eval_customers"))
      .crossJoin(scoredCusts.agg(count(lit(1)).as("n_scored")))
      .crossJoin(hitCusts.agg(count(lit(1)).as("n_hits")))
      .withColumn("hit_rate_ppm",
        when(col("n_scored") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(n_hits * 1000000 div n_scored AS BIGINT)")))
  }

  /** FREQUENT TRIPLE ITEMSETS (Apriori level 3) — the next rung above
    * [[basketLift]]'s pairs: {a, b, c} bought together ≥ `minSupport`
    * times, the bundle/planogram signal pair rules can't see.
    *
    * LOSSLESS Apriori pruning is the scale story: a triple can't be
    * frequent unless all three of its pairs are, so candidate
    * generation is (frequent-pair instances per basket) × (third item),
    * semi-joined against the frequent-pair list on BOTH new edges
    * before the triple count ever materializes. On a random-basket
    * corpus this collapses the candidate space by orders of magnitude
    * (sf0.01: 260k distinct pairs → 3.4k frequent at support 2); the
    * output is provably identical to the unpruned count — the oracle
    * runs the naive version precisely to pin that.
    *
    * Shape: baskets distinct once (persisted: it feeds the pair join,
    * the instance join and the third-item join); every join is keyed on
    * the basket id or the bounded frequent-pair key. A mega-basket
    * contributes |basket|² pair instances — cap baskets upstream (the
    * standard market-basket hygiene rule) if a pathological order
    * exists. Returns (a, b, c, support), support-desc then
    * lexicographic. */
  def tripleItemsets(
      li: DataFrame,
      minSupport: Long = 2L,
      basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey"): DataFrame = {
    require(minSupport >= 1, s"tripleItemsets: need minSupport >= 1, got $minSupport")
    val b = li.select(col(basketCol).as("_o"), col(itemCol).as("_p")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairInst = b.as("x")
      .join(b.as("y"), col("x._o") === col("y._o") && col("x._p") < col("y._p"))
      .select(col("x._o").as("_o"), col("x._p").as("_a"), col("y._p").as("_b"))
    val f2 = pairInst.groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("_s")).where(col("_s") >= minSupport)
      .select("_a", "_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freqPairInst = pairInst.join(f2, Seq("_a", "_b"), "left_semi")
    freqPairInst
      .join(b.as("z"), col("z._o") === freqPairInst("_o") && col("z._p") > freqPairInst("_b"))
      .select(col("_a"), col("_b"), col("z._p").as("_c"), freqPairInst("_o"))
      // Apriori: the two new edges must also be frequent pairs
      .join(f2.select(col("_a"), col("_b").as("_c")), Seq("_a", "_c"), "left_semi")
      .join(f2.select(col("_a").as("_b"), col("_b").as("_c")), Seq("_b", "_c"), "left_semi")
      .groupBy(col("_a").as("a"), col("_b").as("b"), col("_c").as("c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("a"), col("b"), col("c"))
  }

  /** PRICE–VOLUME BRIDGE between two periods per segment — the FP&A
    * revenue walk ("how much of the move was selling MORE vs selling
    * DEARER"): for each segment with activity in both periods,
    *   `vol_effect   = sgn·(|Δq|·r0 div q0)`  — the volume change
    *     priced at the period-0 average (one re-signed integral
    *     division, engine-portable),
    *   `price_effect = (r1 − r0) − vol_effect` — the EXACT residual,
    * so `vol_effect + price_effect = Δrevenue` holds to the micro by
    * construction (no float identity to hope for; the rounding lives
    * visibly inside the volume term, the convention every bridge
    * chooses somewhere).
    *
    * Shape: ONE partial agg on (segment, period) collapses the corpus;
    * the two-period pivot is a segment-keyed self-join of that bounded
    * table. Segments active in only one period drop (no bridge exists —
    * they belong in an entry/exit line, not a rate split).
    *
    * Returns (segment, r0_micro, r1_micro, q0, q1, vol_effect_micro,
    * price_effect_micro), segment-ordered. */
  def priceVolumeBridge(
      df: DataFrame,
      segCol: String,
      periodCol: String,
      qtyCol: String,
      revCol: String,
      period0: Long,
      period1: Long): DataFrame = {
    val base = df
      .where(col(periodCol).isin(period0, period1) &&
        col(qtyCol).isNotNull && col(revCol).isNotNull)
      .groupBy(col(segCol).as("segment"), col(periodCol).as("_p"))
      .agg(sum(col(qtyCol).cast("long")).as("_q"),
        sum(floor(col(revCol).cast("double") * lit(1000000.0d)).cast("long"))
          .as("_r"))
    val p0 = base.where(col("_p") === period0)
      .select(col("segment"), col("_q").as("q0"), col("_r").as("r0_micro"))
    val p1 = base.where(col("_p") === period1)
      .select(col("segment"), col("_q").as("q1"), col("_r").as("r1_micro"))
    p0.join(p1, Seq("segment"))
      .where(col("q0") > 0)
      .withColumn("vol_effect_micro",
        expr("CAST(CASE WHEN q1 >= q0 THEN 1 ELSE -1 END AS BIGINT) * " +
          "CAST(CAST(abs(q1 - q0) AS DECIMAL(38,0)) * r0_micro div q0 AS BIGINT)"))
      .withColumn("price_effect_micro",
        col("r1_micro") - col("r0_micro") - col("vol_effect_micro"))
      .select("segment", "r0_micro", "r1_micro", "q0", "q1",
        "vol_effect_micro", "price_effect_micro")
      .orderBy("segment")
  }
}

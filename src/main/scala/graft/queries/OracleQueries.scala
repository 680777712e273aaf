package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Ffill

/** SURVEY §2.11's Q1–Q18 oracle suite: each query exercises one operator
  * family from the §2 inventory, expressed with the DataFrame API (so the
  * engine's own operators are what run), with a DuckDB-dialect oracle in
  * [[oracleSql]]. Every query is fully ordered and every computed column
  * aliased identically on both sides (the driver's compare hashes values
  * under sorted column names).
  */
object OracleQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — scan + filter + projection; predicate pushdown to parquet.
    "q01_scan_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderstatus") === "F" && col("o_totalprice") >= 1000)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // Q2 — F1 sentinel→NULL + F8 coalesce.
    "q02_sentinel_null" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("click")), lit("none")).as("et"))
        .orderBy("event_id")),

    // Q3 — F6/F7 string normalization.
    "q03_string_norm" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          lower(trim(col("c_name"))).as("n"),
          regexp_replace(col("c_mktsegment"), "[^A-Za-z]", "").as("seg"))
        .orderBy("c_custkey")),

    // Q4 — F2/F3 date parts.
    "q04_year" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
        .orderBy("o_orderkey")),

    // Q5 — F11 CASE categorization (transform_tipe_ldv shape).
    "q05_case_category" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          when(col("p_size") < 10, "liviano")
            .when(col("p_size") < 30, "mediano")
            .otherwise("pesado").as("cat"))
        .orderBy("p_partkey")),

    // Q6 — W1 forward-fill via the engine's partition-parallel Ffill op.
    "q06_ffill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("_ff_src", nullif(col("event_type"), lit("noop")))
      Ffill.ffill(ev, orderCol = "event_id", cols = Seq("_ff_src"),
          partitionCols = Seq("user_id"))
        .select(col("event_id"), col("_ff_src").as("ff"))
        .orderBy("event_id")
    }),

    // Q7 — J1 broadcast left join + F8 coalesce.
    "q07_left_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_name"), lit("unknown")).as("nat"))
        .orderBy("c_custkey")
    }),

    // Q8 — J2/A5 scored top-1 per key (broadcast NL join + window argmax).
    "q08_fuzzy_top1" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val scored = sup.crossJoin(broadcast(nat))
        .select(col("s_name"), col("n_name").as("cand"),
          levenshtein(col("s_name"), col("n_name")).as("d"))
      val w = Window.partitionBy(col("s_name"))
        .orderBy(col("d").asc, col("cand").asc)
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("s_name", "cand", "d")
        .orderBy("s_name")
    }),

    // Q9 — A1 global mean imputation (scalar agg folded in as literal).
    "q09_mean_impute" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = li.agg(round(avg(nullif(col("l_discount"), lit(0.0))), 2))
        .first().getDouble(0)
      li.select(col("l_orderkey"), col("l_linenumber"),
          round(coalesce(nullif(col("l_discount"), lit(0.0)), lit(m)), 2).as("disc"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q10 — A3 row-wise fixed-denominator mean.
    "q10_row_mean" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round((coalesce(col("l_tax"), lit(0.0)) + coalesce(col("l_discount"), lit(0.0))) / 2, 6).as("m"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Q11 — A4/P7 distinct.
    "q11_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    // Q12 — dashboard group-by (partial agg map-side, 1 shuffle).
    "q12_groupby" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
        .orderBy("c_mktsegment")),

    // Q13 — F13 truncated SHA-256 memo key.
    "q13_sha" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), substring(sha2(col("c_name"), 256), 1, 12).as("h"))
        .orderBy("c_custkey")),

    // Q14 — O2 ORDER BY ... LIMIT (TakeOrderedAndProject, no full sort).
    "q14_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Q15 — U1 union all.
    "q15_union" -> ((s, dir) =>
      t(s, dir, "nation").select(col("n_name").as("name"))
        .unionAll(t(s, dir, "region").select(col("r_name").as("name")))
        .orderBy("name")),

    // Q16 — A2 global min/max.
    "q16_minmax" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        min(year(col("o_orderdate"))).as("y0"),
        max(year(col("o_orderdate"))).as("y1"))),

    // Q17 — F12 column-keyed dispatch folded to a CASE tree. Money math
    // in exact decimals: double×double rounding is engine-dependent at
    // half-way points, decimal×decimal is not.
    "q17_dispatch" -> ((s, dir) => {
      val price = col("l_extendedprice").cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(
            when(col("l_returnflag") === "R", price * lit(BigDecimal("0.87")))
              .when(col("l_returnflag") === "A", price * lit(BigDecimal("8.60")))
              .otherwise(price), 2).cast("double").as("equiv"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q18 — F23 explode (posexplode over the embedding array).
    "q18_explode" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"),
          (round(col("col").cast("double"), 4) + 0.0).as("x")) // +0.0 folds -0.0 to 0.0
        .orderBy("vec_id", "pos")),

    // Q19 — left anti join (the not_found complement shape, SURVEY §2.3).
    // right side restricted to urgent orders so the complement is
    // non-empty at every sf — an all-keys-match anti join verifies an
    // empty result, i.e. nothing
    "q19_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // Q20 — left semi join (EXISTS).
    "q20_semi_join" -> ((s, dir) => {
      val su = t(s, dir, "supplier"); val li = t(s, dir, "lineitem")
      su.join(li, su("s_suppkey") === li("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey")
    })
  )

  /** DuckDB 1.0 dialect oracles (no WITH ORDINALITY; regexp_replace needs
    * the 'g' flag; sha256 instead of sha2). */
  val oracleSql: Map[String, String] = Map(
    "q01_scan_filter" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_totalprice >= 1000 ORDER BY o_orderkey",
    "q02_sentinel_null" ->
      "SELECT event_id, COALESCE(NULLIF(event_type, 'click'), 'none') AS et FROM events ORDER BY event_id",
    "q03_string_norm" ->
      "SELECT c_custkey, LOWER(TRIM(c_name)) AS n, REGEXP_REPLACE(c_mktsegment, '[^A-Za-z]', '', 'g') AS seg FROM customer ORDER BY c_custkey",
    "q04_year" ->
      "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INT) AS yr FROM orders ORDER BY o_orderkey",
    "q05_case_category" ->
      "SELECT p_partkey, CASE WHEN p_size < 10 THEN 'liviano' WHEN p_size < 30 THEN 'mediano' ELSE 'pesado' END AS cat FROM part ORDER BY p_partkey",
    "q06_ffill" ->
      "SELECT event_id, LAST_VALUE(NULLIF(event_type,'noop') IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff FROM events ORDER BY event_id",
    "q07_left_join" ->
      "SELECT c.c_custkey, COALESCE(n.n_name, 'unknown') AS nat FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c.c_custkey",
    "q08_fuzzy_top1" ->
      "SELECT s_name, cand, d FROM (SELECT s.s_name, n.n_name AS cand, LEVENSHTEIN(s.s_name, n.n_name) AS d, ROW_NUMBER() OVER (PARTITION BY s.s_name ORDER BY LEVENSHTEIN(s.s_name, n.n_name) ASC, n.n_name) AS rn FROM supplier s CROSS JOIN nation n) t WHERE rn = 1 ORDER BY s_name",
    "q09_mean_impute" ->
      "SELECT l_orderkey, l_linenumber, ROUND(COALESCE(NULLIF(l_discount, 0.0), (SELECT ROUND(AVG(NULLIF(l_discount, 0.0)), 2) FROM lineitem)), 2) AS disc FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q10_row_mean" ->
      "SELECT l_orderkey, l_linenumber, ROUND((COALESCE(l_tax, 0) + COALESCE(l_discount, 0)) / 2, 6) AS m FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q11_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q12_groupby" ->
      "SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "q13_sha" ->
      "SELECT c_custkey, substring(sha256(c_name), 1, 12) AS h FROM customer ORDER BY c_custkey",
    "q14_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q15_union" ->
      "SELECT name FROM (SELECT n_name AS name FROM nation UNION ALL SELECT r_name AS name FROM region) u ORDER BY name",
    "q16_minmax" ->
      "SELECT CAST(MIN(YEAR(o_orderdate)) AS INT) AS y0, CAST(MAX(YEAR(o_orderdate)) AS INT) AS y1 FROM orders",
    "q17_dispatch" ->
      "SELECT l_orderkey, l_linenumber, CAST(ROUND(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * 0.87 WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * 8.60 ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(21,4)) END, 2) AS DOUBLE) AS equiv FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q18_explode" ->
      "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos, ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS x FROM embeddings ORDER BY vec_id, pos",
    "q19_anti_join" ->
      ("SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey"),
    "q20_semi_join" ->
      "SELECT s_suppkey, s_name FROM supplier s WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey) ORDER BY s_suppkey"
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.queries.OracleQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the dashboard's core question shape (SURVEY §7 step 2) on
    * the synthetic star schema — revenue + volume per year × nation, with
    * dimension broadcast and a single fact shuffle. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("yr", "nation")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    OracleQueries.queries ++ graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    OracleQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Event-log ETL operators: semi-structured payload extraction and
  * robust (exact-arithmetic) outlier statistics. */
object EventsOps {

  /** Extract typed fields from the semi-structured `props` JSON column
    * with a declared schema (`from_json` is codegen'd and map-only — at
    * 100 TB the parse cost is the scan itself; never regex a JSON blob).
    * Unparseable or missing fields come out NULL, never fail the task. */
  def parseProps(ev: DataFrame, propsCol: String = "props"): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    ev.withColumn("_p", from_json(col(propsCol), schema))
      .withColumn("prop_k", col("_p.k"))
      .drop("_p")
  }

  /** Per-group 3-sigma outlier counts over a double measure, computed in
    * EXACT integer/decimal arithmetic so the result is reproducible on
    * any engine and any aggregation order (float sums are
    * order-dependent; a distributed re-run could otherwise flip a
    * boundary row). The measure is fixed to 6 decimal places (exact for
    * the source data), then everything is integer:
    *
    *   outlier  ⇔  (x−μ)² > 9σ²
    *            ⇔  ((x·n − s)² · (n−1)  >  9 · n · (n·q − s²))     [·n²(n−1)]
    *
    * with s = Σx, q = Σx² in scaled-integer units — all DECIMAL(38,0),
    * no division, no doubles. Sample variance (n−1); groups with n < 2
    * report 0 outliers. Two shuffles: the stats partial-agg and the
    * broadcast join of 5-row group stats back onto the rows. */
  def valueOutliers(
      ev: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    // 1e-6-unit integer value: DOUBLE → DECIMAL(18,6) is an exact
    // half-up rounding of the binary value on both Spark and DuckDB
    // (binary doubles are never exact ties at 6 decimals)
    val v6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(38,0)")
    val rows = ev.select(col(groupCol).as("g"), v6.as("v"))
    val stats = rows.groupBy("g").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("v")).cast("decimal(38,0)").as("s"),
      sum((col("v") * col("v")).cast("decimal(38,0)")).cast("decimal(38,0)").as("q"))
    val d = (col("v") * col("n") - col("s")).cast("decimal(38,0)")
    val lhs = (d * d).cast("decimal(38,0)") * (col("n") - lit(1)).cast("decimal(38,0)")
    val rhs = lit(9).cast("decimal(38,0)") * col("n") *
      (col("n") * col("q") - (col("s") * col("s")).cast("decimal(38,0)"))
    rows.join(broadcast(stats), Seq("g"))
      .withColumn("_out",
        when(col("n") < 2, lit(false)).otherwise(lhs > rhs))
      .groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_out"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("g").as(groupCol), col("n_rows"), col("n_outliers"))
  }
}

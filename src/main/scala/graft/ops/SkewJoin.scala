package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases
  * at runtime; explicit salting remains the tool when one key dominates
  * so heavily that even split shuffle blocks hot-spot a single executor
  * (the classic 100 TB heavy-hitter join).
  *
  * Shape: the fact side derives a deterministic salt in [0, salts) from a
  * per-row distinct column; the dimension side explodes every salt value,
  * so the join key becomes (key, salt) and the hot key's rows spread over
  * `salts` reducers. Dimension inflation is ×salts — use on broadcast-
  * refusing but still modest build sides. */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val exploded = dim.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Join-key skew diagnostic — the measurement that tells you WHETHER
    * (and how much) to salt before a 100 TB shuffle: the `topK` heaviest
    * keys with their row count, parts-per-million share of all rows, the
    * skew multiple vs the mean key size (micro-units: `cnt·n_keys·10⁶
    * div total`), and a recommended salt factor (the multiple rounded
    * UP — exactly the `salts` argument [[saltedJoin]] wants).
    *
    * Shape: one partial-agg shuffle on the key (map-side combine does
    * the heavy lifting for precisely the keys this looks for), a 1-row
    * global summary broadcast back, and a TakeOrdered top-k — no full
    * sort, no collect of the key histogram. Products run in
    * DECIMAL(38,0) (HUGEINT in oracles) so a trillion-row key times a
    * billion-key count cannot wrap; outputs are plain BIGINTs.
    * Deterministic: ties in cnt break on the key value. */
  def keySkewReport(
      df: DataFrame,
      keyCol: String,
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"keySkewReport: need topK > 0, got $topK")
    val d = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).cast(d).as("_total"),
      count(lit(1)).cast(d).as("_n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        (col("cnt").cast(d) * lit(1000000L).cast(d)).as("_c6"),
        (col("cnt").cast(d) * col("_n_keys")).as("_ck"),
        col("_total"), col("_n_keys"))
      .selectExpr("key", "cnt",
        "CAST(_c6 div _total AS BIGINT) AS ppm",
        "CAST((_ck * 1000000) div _total AS BIGINT) AS skew_x_micro",
        "CAST((_ck + _total - 1) div _total AS BIGINT) AS salt_factor")
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
  }
}

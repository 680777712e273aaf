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
}

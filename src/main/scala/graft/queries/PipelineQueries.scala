package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries exercising the LLM-training-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal, streaming-as-batch) and
  * the homologation pipeline itself. Filled in per-operator; keys join
  * [[OracleQueries]] in SparkEntry. */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the lingua franca of LLM training-data
  * interchange (one JSON object per line; HuggingFace datasets, Dolma,
  * RedPajama all ship it, usually gzip'd). Spark's json reader IS the
  * distributed JSONL reader (each line parses independently, so splits
  * parallelize like any text file; `.gz` inputs decompress transparently
  * but are non-splittable — one task per file, which is why corpus
  * drops ship thousands of shards).
  *
  * Two contracts the stock reader gets wrong for pipeline use, fixed
  * here:
  *  - **Never infer schema over the corpus.** Inference is a full extra
  *    pass at 100 TB and yields drifting types across drops. [[read]]
  *    demands the schema.
  *  - **Never silently eat corrupt records.** PERMISSIVE mode nulls
  *    them; DROPMALFORMED hides them. [[readStrict]] keeps the corrupt
  *    line in `_corrupt_record` and the caller decides; [[countCorrupt]]
  *    makes the audit a one-liner.
  */
object Jsonl {

  /** Schema-checked JSONL scan. Fields present in the schema but absent
    * on a line come out NULL (the JSONL norm for optional fields);
    * malformed lines become all-NULL rows (PERMISSIVE) — use
    * [[readStrict]] when that must be loud. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Like [[read]] but malformed lines are retained verbatim in
    * `_corrupt_record` instead of dissolving into NULLs. */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Count of malformed lines under `path` — the ingest audit. Spark
    * refuses a scan that references ONLY the corrupt-record column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parsed frame is cached
    * whole for the one count, then released. */
  def countCorrupt(spark: SparkSession, path: String, schema: StructType): Long = {
    val df = readStrict(spark, path, schema).cache()
    try df.where(col("_corrupt_record").isNotNull).count()
    finally df.unpersist()
  }

  /** JSONL sink; `gzip = true` writes `.json.gz` part files (the
    * interchange default — smaller and line-exact, at the price of
    * non-splittable parts, so size shards via the upstream partition
    * count, roughly one part per a-few-hundred-MB uncompressed). */
  def write(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Malformed-row quarantine for schema'd CSV ingestion: parse in
  * PERMISSIVE mode with `columnNameOfCorruptRecord`, split the stream
  * into (good, quarantined) — the standard production ladder between
  * FAILFAST (one bad row kills a 100 TB job) and DROPMALFORMED (bad
  * rows vanish without audit). Quarantined rows keep their RAW LINE so
  * the producer can be debugged and the rows replayed after a fix.
  *
  * Spark caveat encoded here: the corrupt-record column must be part of
  * the declared schema, and a query may not filter ONLY on the corrupt
  * column straight off the scan (Spark forbids it — the parser would
  * prune every data column away and nothing would be "corrupt") — the
  * split therefore goes through one persisted parse, which is also the
  * efficient plan: parse once, serve both halves.
  *
  * Scale shape: the parse is map-only and line-parallel; `good`/`bad`
  * are narrow projections off the same cached scan. The cache is
  * DISK-spillable and the caller unpersists via [[QuarantineSplit.done]].
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** One parsed+persisted CSV with the good/quarantined split. */
  final case class QuarantineSplit(
      good: DataFrame, bad: DataFrame, private val parsed: DataFrame) {
    /** Release the shared parse cache once both halves are consumed. */
    def done(): Unit = { parsed.unpersist(blocking = false); () }
  }

  /** Read `path` against `schema`; rows that fail to parse (wrong arity,
    * uncastable cell under the declared types) land in `bad` with the
    * raw line. `good` has exactly the declared columns. */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): QuarantineSplit = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"Quarantine.readCsv: schema must not declare $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QuarantineSplit(
      good = parsed.where(col(CorruptCol).isNull)
        .select(schema.fieldNames.map(col).toSeq: _*),
      bad = parsed.where(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw_line")),
      parsed = parsed)
  }
}

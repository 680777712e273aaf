package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width (positional) file reader — the mainframe/EDI interchange
  * format that never dies: every record is one line, every field a
  * declared (offset, length) slice. No delimiter ambiguity, no quoting,
  * no escaping — and no self-description, which is why the layout is a
  * caller-supplied spec, exactly like a COBOL copybook.
  *
  * Distributed by construction: `spark.read.text` line-splits in
  * parallel and every field is a `substring` projection — map-only, at
  * 100 TB the parse IS the scan. Casts go through the engine's
  * non-ANSI (coerce-to-null) mode, so a bad cell NULLs rather than
  * killing the job; pair with a post-read null screen
  * ([[graft.ops.Governance.nullProfile]]) for the audit.
  */
object FixedWidth {

  /** One field: 1-BASED start column (the copybook convention), width
    * in characters, and an optional Spark SQL cast type. */
  final case class Field(name: String, start: Int, width: Int, cast: Option[String] = None) {
    require(start >= 1, s"FixedWidth.Field $name: start is 1-based, got $start")
    require(width >= 1, s"FixedWidth.Field $name: need width >= 1, got $width")
  }

  /** Read `path` under `fields`; short lines yield empty (→ NULL after
    * trim) tails, long lines ignore the excess — both declared, both
    * how positional consumers behave. `trimValues` strips the space
    * padding fixed-width files carry by definition. */
  def read(
      spark: SparkSession,
      path: String,
      fields: Seq[Field],
      trimValues: Boolean = true): DataFrame = {
    require(fields.nonEmpty, "FixedWidth.read: need at least one field")
    require(fields.map(_.name).distinct.size == fields.size,
      s"FixedWidth.read: duplicate field names in ${fields.map(_.name)}")
    val cols: Seq[Column] = fields.map { f =>
      val raw = substring(col("value"), f.start, f.width)
      val trimmed = if (trimValues) trim(raw) else raw
      val nulled = when(length(trimmed) === 0, lit(null).cast("string"))
        .otherwise(trimmed)
      f.cast.fold(nulled)(t => nulled.cast(t)).as(f.name)
    }
    spark.read.text(path).select(cols: _*)
  }
}

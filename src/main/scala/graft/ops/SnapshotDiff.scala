package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the incremental-ETL primitive: given yesterday's and
  * today's snapshot of a keyed table, classify every key as `added`,
  * `removed`, or `changed` (content fingerprint differs). One full outer
  * join hash-partitioned on the key; content is compared through a
  * fixed-width fingerprint so wide rows shuffle as (key, 16-byte hash)
  * instead of full payloads. Unchanged keys are dropped by default —
  * at 100 TB the diff output is the small side, never the snapshots.
  */
object SnapshotDiff {

  /** Fingerprint of the content columns. Each value is length-prefixed
    * (len:value) and NULL encodes as a bare marker - column boundaries
    * cannot shift even when a value contains the separator, and NULL vs
    * empty string is a real change, not a collision. */
  private def fp(contentCols: Seq[String]) =
    sha2(concat_ws("\u0001", contentCols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*), 256)

  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      contentCols: Seq[String],
      keepUnchanged: Boolean = false): DataFrame = {
    val o = oldSnap.select(col(keyCol), fp(contentCols).as("_fp_old"))
    val n = newSnap.select(col(keyCol), fp(contentCols).as("_fp_new"))
    val joined = o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") =!= col("_fp_new"), "changed")
          .otherwise("unchanged"))
    (if (keepUnchanged) joined else joined.where(col("status") =!= "unchanged"))
      .select(col(keyCol), col("status"))
  }

  /** SCD type-2 apply — history-preserving CDC: each key's lineage is a
    * run of versioned rows `(payload, valid_from, valid_to)` with the
    * live version open (`valid_to` NULL). Applying a change batch at
    * `batchId` closes the open row of every changed/removed key and
    * appends a fresh open row for every added/changed key. Same scale
    * shape as [[applyDiff]]: ONE key-partitioned join against the
    * (small) change set + a union — history payloads never reshuffle
    * more than the join key, closed rows pass through untouched.
    * `history` must carry `valid_from`/`valid_to` BIGINT columns;
    * bootstrap from an empty history (zero rows) works — everything
    * inserts. */
  def scd2Apply(
      history: DataFrame,
      changes: DataFrame,
      keyCol: String,
      batchId: Long): DataFrame = {
    val affected = changes
      .where(col("status").isin("changed", "removed", "added"))
      .select(col(keyCol), lit(true).as("_hit"))
    val payloadCols = history.columns.filterNot(Seq("valid_from", "valid_to").contains)
    val closed = history.join(affected, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("valid_to").isNull && col("_hit"), lit(batchId))
          .otherwise(col("valid_to")))
      .drop("_hit")
    val inserts = changes
      .where(col("status").isin("added", "changed"))
      .drop("status")
      .select(payloadCols.map(col).toIndexedSeq: _*)
      .withColumn("valid_from", lit(batchId))
      .withColumn("valid_to", lit(null).cast("long"))
    closed.unionByName(inserts)
  }

  /** Apply a change set to a base snapshot — the CDC merge / upsert
    * primitive closing the incremental-ETL loop that [[diff]] opens:
    * `applyDiff(old, diff(old,new) ⋈ payload) == new`. `changes` carries
    * (key, status, payload columns); `added`/`changed` keys are inserted
    * with their payload, `removed` keys are dropped, and base rows whose
    * key is absent from `changes` pass through untouched. One
    * key-partitioned anti join + a union — the change set is the small
    * side at 100 TB (often broadcast-able; left to AQE since "small" is
    * a runtime property), and base payloads never reshuffle wider than
    * the join key. Unknown status values raise rather than silently
    * dropping rows. */
  def applyDiff(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val checked = changes.withColumn("status",
      when(col("status").isin("added", "removed", "changed"), col("status"))
        .otherwise(raise_error(concat(lit("applyDiff: unknown status "),
          col("status")))))
    val kept = base.join(checked.select(keyCol), Seq(keyCol), "left_anti")
    val upserts = checked
      .where(col("status").isin("added", "changed"))
      .drop("status")
      .select(base.columns.map(col).toIndexedSeq: _*)
    kept.unionByName(upserts)
  }

  /** Per-key ADDITIVE aggregate state from raw events — the unit an
    * incremental pipeline checkpoints: (key, n, sum_micro, min_micro,
    * max_micro). Values micro-quantize to BIGINT; one partial-agg
    * shuffle. NULL values are excluded everywhere (they contribute no
    * state). */
  def aggState(
      ev: DataFrame,
      keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    ev.where(col(valueCol).isNotNull)
      .select(col(keyCol),
        floor(col(valueCol).cast("double") * lit(1000000.0d)).cast("long").as("_v"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("sum_micro"),
        min(col("_v")).as("min_micro"), max(col("_v")).as("max_micro"))

  /** MERGE two [[aggState]] checkpoints — incremental view maintenance:
    * `merge(state(batch₁), state(batch₂)) == state(batch₁ ∪ batch₂)`,
    * the invariant the p174 gate proves against a full DuckDB
    * recompute. Counts/sums add; min/max take the null-safe envelope;
    * keys present on one side pass through. One key-table-sized FULL
    * OUTER join — state is key-cardinality-bounded, so at 100 TB this
    * merge touches checkpoints, never raw history: the whole point of
    * keeping additive state. */
  def mergeAggState(a: DataFrame, b: DataFrame, keyCol: String = "event_type"): DataFrame = {
    val bb = b.select(col(keyCol), col("n").as("_n2"), col("sum_micro").as("_s2"),
      col("min_micro").as("_mn2"), col("max_micro").as("_mx2"))
    a.join(bb, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_n2"), lit(0L))).as("n"),
        (coalesce(col("sum_micro"), lit(0L)) + coalesce(col("_s2"), lit(0L)))
          .as("sum_micro"),
        least(col("min_micro"), col("_mn2")).as("min_micro"),
        greatest(col("max_micro"), col("_mx2")).as("max_micro"))
  }

  /** TIME TRAVEL over an SCD2 history: the table AS OF batch `t` —
    * rows whose validity interval covers t (`valid_from ≤ t` and
    * `valid_to` open or `> t`), validity columns dropped. The read-side
    * contract of [[scd2Apply]]: `asOf(apply(apply(∅, b1), b2), 1)`
    * must equal snapshot 1 EXACTLY — which is precisely what the p209
    * gate pins (its oracle is the original table itself).
    * Map-only filter; at 100 TB this is a partition-prunable scan when
    * history is stored partitioned by validity. */
  def asOf(history: DataFrame, t: Long): DataFrame =
    history
      .where(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .drop("valid_from", "valid_to")

  /** GOLDEN-RECORD survivorship — MDM-style best-record fusion: per key,
    * take each column's value from the MOST RECENT version where that
    * column is non-null ("latest non-null wins", the standard
    * survivorship rule; a newer row with a null field does NOT erase an
    * older field — that is [[scd2Apply]]'s overwrite semantics, not
    * fusion).
    *
    * Per column: `max(when(v.isNotNull, struct(sec, tie, v)))` — the
    * aggregate ignores the null-valued versions entirely and the
    * (sec, tie) prefix makes the struct max the latest one; ONE
    * partial-agg'd aggregate for ALL columns together, no window, no
    * per-key sort (same struct-max recipe as [[EventsOps.ohlcBars]]).
    * At 100 TB parallelism = #keys; hot keys collapse map-side.
    *
    * Returns (keyCol, n_versions, last_sec, <c>_golden per value col) —
    * a `_golden` field is NULL only when every version had it null. */
  def goldenRecord(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecord: need at least one value column")
    val sec = floor(unix_micros(col(tsCol)).cast("double") / lit(1000000.0d))
      .cast("long")
    val base = df.select(
      (col(keyCol) +: sec.as("_s") +: col(tieCol).as("_tie") +:
        valueCols.map(col)): _*)
    val aggs =
      count(lit(1)).as("n_versions") +:
        max(col("_s")).as("last_sec") +:
        valueCols.map(c =>
          max(when(col(c).isNotNull, struct(col("_s"), col("_tie"), col(c))))
            .as(s"_g_$c"))
    base.groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col(keyCol) +: col("n_versions") +: col("last_sec") +:
          valueCols.map(c => col(s"_g_$c").getField(c).as(s"${c}_golden"))): _*)
  }
}

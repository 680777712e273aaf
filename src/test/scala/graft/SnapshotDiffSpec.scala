package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SnapshotDiff

/** Snapshot diff semantics: added/removed/changed classification, the
  * concat-boundary non-collision, and unchanged suppression. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classifies added, removed, changed; drops unchanged by default") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "u", "v")
    val neu = Seq((2L, "b", "y"), (3L, "c", "CHANGED"), (4L, "d", "w"))
      .toDF("id", "u", "v")
    val out = SnapshotDiff.diff(old, neu, "id", Seq("u", "v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
    val all = SnapshotDiff.diff(old, neu, "id", Seq("u", "v"), keepUnchanged = true)
    assert(all.where($"status" === "unchanged").count() == 1)
  }

  test("column boundaries don't collide: (ab, c) differs from (a, bc)") {
    val old = Seq((1L, "ab", "c")).toDF("id", "u", "v")
    val neu = Seq((1L, "a", "bc")).toDF("id", "u", "v")
    val out = SnapshotDiff.diff(old, neu, "id", Seq("u", "v")).collect()
    assert(out.length == 1 && out(0).getString(1) == "changed")
  }

  test("null content compares equal to itself; NULL vs empty IS a change") {
    val old = Seq((1L, Option.empty[String], Some("v"))).toDF("id", "u", "v")
    val same = Seq((1L, Option.empty[String], Some("v"))).toDF("id", "u", "v")
    assert(SnapshotDiff.diff(old, same, "id", Seq("u", "v")).count() == 0)
    val emptied = Seq((1L, Some(""), Some("v"))).toDF("id", "u", "v")
    val out = SnapshotDiff.diff(old, emptied, "id", Seq("u", "v")).collect()
    assert(out.length == 1 && out(0).getString(1) == "changed")
  }

  test("content containing the separator byte cannot shift across boundaries") {
    val old = Seq((1L, "a\u0001b", "c")).toDF("id", "u", "v")
    val neu = Seq((1L, "a", "b\u0001c")).toDF("id", "u", "v")
    val out = SnapshotDiff.diff(old, neu, "id", Seq("u", "v")).collect()
    assert(out.length == 1 && out(0).getString(1) == "changed")
  }

  test("applyDiff closes the CDC loop: applyDiff(old, diff ⋈ payload) == new") {
    val old = Seq((1L, "keep", "x"), (2L, "stale", "y"), (3L, "gone", "z"))
      .toDF("id", "u", "v")
    val neu = Seq((1L, "keep", "x"), (2L, "fresh", "y"), (4L, "born", "w"))
      .toDF("id", "u", "v")
    val d = SnapshotDiff.diff(old, neu, "id", Seq("u", "v"))
    val changes = d.join(neu, Seq("id"), "left")
    val merged = SnapshotDiff.applyDiff(old, changes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(merged.toSeq == Seq((1L, "keep", "x"), (2L, "fresh", "y"), (4L, "born", "w")))
  }

  test("scd2Apply: bootstrap, close-and-insert on change, close on remove") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "u")
    val empty = v1.limit(0)
      .withColumn("valid_from", org.apache.spark.sql.functions.lit(0L))
      .withColumn("valid_to",
        org.apache.spark.sql.functions.lit(null).cast("long"))
    val c1 = SnapshotDiff.diff(v1.limit(0), v1, "id", Seq("u"))
      .join(v1, Seq("id"), "left")
    val h1 = SnapshotDiff.scd2Apply(empty, c1, "id", batchId = 1L)
    // batch 2: id 2 changes, id 3 removed, id 4 added
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "u")
    val c2 = SnapshotDiff.diff(v1, v2, "id", Seq("u"))
      .join(v2, Seq("id"), "left")
    val h2 = SnapshotDiff.scd2Apply(h1, c2, "id", batchId = 2L)
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(h2.toSeq == Seq(
      (1L, "a", 1L, -1L),            // untouched, still open
      (2L, "b", 1L, 2L),             // closed at batch 2
      (2L, "B", 2L, -1L),            // new open version
      (3L, "c", 1L, 2L),             // removed: closed, no successor
      (4L, "d", 2L, -1L)))           // added in batch 2
  }

  test("applyDiff: unknown change status raises instead of dropping rows") {
    val old = Seq((1L, "a", "b")).toDF("id", "u", "v")
    val changes = Seq((1L, "mangled", "a", "b")).toDF("id", "status", "u", "v")
    val e = intercept[Exception] {
      SnapshotDiff.applyDiff(old, changes, "id").collect()
    }
    assert(e.getMessage.contains("unknown status"))
  }

  test("mergeAggState: merge of split batches equals full recompute; one-sided keys pass") {
    import spark.implicits._
    val all = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("c", 5.0)
    ).toDF("event_type", "value")
    import org.apache.spark.sql.functions.col
    // split so that "b" is only in batch 1 and "c" only in batch 2
    val b1 = all.where(col("value") <= 3.0 && col("event_type") === "a")
      .union(all.where(col("event_type") === "b"))
    val b2 = all.except(b1)
    val merged = SnapshotDiff.mergeAggState(
        SnapshotDiff.aggState(b1), SnapshotDiff.aggState(b2))
      .orderBy("event_type").collect().map(_.toSeq)
    val full = SnapshotDiff.aggState(all)
      .orderBy("event_type").collect().map(_.toSeq)
    assert(merged.toSeq == full.toSeq)
  }

  test("goldenRecord: latest non-null wins per column; newer null never erases") {
    import spark.implicits._
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      // key 1: v set at t=1, nulled at t=2; name set at t=2
      (1L, 1L, at(1), Option(10L), Option.empty[String]),
      (2L, 1L, at(2), Option.empty[Long], Option("new")),
      // key 2: both fields only in the OLDER version
      (3L, 2L, at(5), Option(7L), Option("x")),
      (4L, 2L, at(9), Option.empty[Long], Option.empty[String]),
      // key 3: all null everywhere → golden NULLs
      (5L, 3L, at(4), Option.empty[Long], Option.empty[String]),
      // same-second versions: tie broken by the tie column (id 7 wins)
      (6L, 4L, at(8), Option(1L), None), (7L, 4L, at(8), Option(2L), None)
    ).toDF("id", "k", "ts", "v", "name")
    val out = SnapshotDiff.goldenRecord(df, "k", "ts", "id", Seq("v", "name"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4))))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, Some(10L), Some("new")),
      (2L, 2L, 9L, Some(7L), Some("x")),
      (3L, 1L, 4L, None, None),
      (4L, 2L, 8L, Some(2L), None)))
  }

  test("asOf: validity-interval reconstruction at each batch boundary") {
    import spark.implicits._
    // key 1 inserted at 1, superseded at 2; key 2 inserted at 1 and
    // closed (removed) at 2; key 3 inserted at 2
    val hist = Seq(
      (1L, "v1", 1L, Option(2L)), (1L, "v2", 2L, Option.empty[Long]),
      (2L, "x", 1L, Option(2L)),
      (3L, "y", 2L, Option.empty[Long])
    ).toDF("k", "payload", "valid_from", "valid_to")
    def at(t: Long) = SnapshotDiff.asOf(hist, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(at(1L).toSeq == Seq((1L, "v1"), (2L, "x")))
    assert(at(2L).toSeq == Seq((1L, "v2"), (3L, "y")))
    // before history begins: empty
    assert(at(0L).isEmpty)
  }
}

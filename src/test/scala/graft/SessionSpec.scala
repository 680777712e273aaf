package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Tables loading details: the nanos→micros timestamp conversion must be
  * integral division — epoch nanos exceed the 52-bit double mantissa, so
  * a double divide can land a full microsecond off. */
class SessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nanosToTimestampMicros is exact above 2^53 ns (integral division)") {
    // 1700000000000000896 / 1000 = 1700000000000000, but the double
    // formulation rounds up to ...001 — prove the hazard is real, then
    // that the conversion avoids it
    val hazard = 1700000000000000896L
    assert((hazard.toDouble / 1000.0).toLong != hazard / 1000L)

    val nanos = Seq(hazard, 0L, 999L, 1000L, 1001L,
      1699999999999999999L, 1700000000000001024L,
      // pre-1970: conversion must FLOOR (round toward -∞), not truncate
      -1L, -999L, -1000L, -1001L, -1500L)
    val got = nanos.toDF("ts")
      .withColumn("ts", Tables.nanosToTimestampMicros("ts"))
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(got == nanos.map(n => Math.floorDiv(n, 1000L)))
  }

  test("events table surfaces ts as a microsecond timestamp") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.select(min(col("ts"))).first().getTimestamp(0) != null)
  }
}

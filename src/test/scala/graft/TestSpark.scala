package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

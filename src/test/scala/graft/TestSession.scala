package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSession {
  lazy val spark: SparkSession = GraftSession.build("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

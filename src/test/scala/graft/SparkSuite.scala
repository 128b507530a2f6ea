package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one per JVM via getOrCreate). */
trait SparkSuite {
  lazy val spark: SparkSession = GraftSession.local("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

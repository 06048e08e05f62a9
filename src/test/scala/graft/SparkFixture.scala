package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (getOrCreate → one session per test
  * JVM; never stopped so suites can run in any order). */
trait SparkFixture {
  lazy val spark: SparkSession = Sessions.local("graft-test", "4")
  val sfDir = "/root/testdata/sf0.001"
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, tests run at
  * sf0.001 for speed — the DuckDB oracle gate runs at sf0.01).
  */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local("4", "4")
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
}

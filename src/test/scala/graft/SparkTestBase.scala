package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite fast; `getOrCreate` reuses it across suites in the forked test
  * JVM). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  def sqlc = spark.sqlContext
}

object SparkTestBase {
  lazy val session: SparkSession = GraftSession.local(4, "graft-test")
}

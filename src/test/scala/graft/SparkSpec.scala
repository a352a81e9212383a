package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Base for all specs: one shared session (SparkEnv semantics — UTC,
  * AQE, nanos-as-long), sf0.001 fixtures for speed. */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkEnv.session("graft-test")
  val Sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared session: do NOT stop between suites
  }
}

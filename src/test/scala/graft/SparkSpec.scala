package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (JVM-wide — Spark session
  * startup dominates test wall-clock otherwise). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.functions.GraftExtensions.builder("local[4]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf0001: String = TestSpark.Sf0001
  def sf001: String = TestSpark.Sf001
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy), 4 threads. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.local(4)
  val sfDir = "/root/testdata/sf0.001"
}

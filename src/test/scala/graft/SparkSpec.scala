package graft

import graft.core.Graft
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    Graft.session(appName = "graft-test", master = "local[4]", shufflePartitions = 4)

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared across suites — do not stop
  }
}

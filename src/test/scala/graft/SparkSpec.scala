package graft

import graft.core.Graft
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  // local[4,2]: 4 threads, 2 task attempts — lets the fault-injection
  // behavioral test exercise task retry in-process.
  lazy val spark: SparkSession =
    Graft.session(appName = "graft-test", master = "local[4,2]", shufflePartitions = 4)

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared across suites — do not stop
  }
}

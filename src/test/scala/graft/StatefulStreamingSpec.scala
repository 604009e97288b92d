package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{KeyedEvent, KeyCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful streaming operators driven through MemoryStream across
  * multiple batches — state must persist between batches.
  */
class StatefulStreamingSpec extends SparkSpec {

  import spark.implicits._

  test("firstSeen dedups across batches; state persists") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StatefulOps.firstSeen(spark, input.toDS())
      .writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      KeyedEvent("a", 10, "a1"), KeyedEvent("b", 5, "b1"),
      KeyedEvent("a", 3, "a0"))
    q.processAllAvailable()
    // within-batch: earliest ts wins
    val batch1 = spark.table("fs_out").as[KeyedEvent].collect().toSet
    assert(batch1 === Set(KeyedEvent("a", 3, "a0"), KeyedEvent("b", 5, "b1")))

    input.addData(
      KeyedEvent("a", 1, "a-late"),  // duplicate key: suppressed even if earlier
      KeyedEvent("c", 7, "c1"))
    q.processAllAvailable()
    val batch2 = spark.table("fs_out").as[KeyedEvent].collect().toSet
    assert(batch2 === Set(
      KeyedEvent("a", 3, "a0"), KeyedEvent("b", 5, "b1"),
      KeyedEvent("c", 7, "c1")))
    q.stop()
  }

  test("runningCount accumulates per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StatefulOps.runningCount(spark, input.toDS())
      .writeStream.format("memory").queryName("rc_out")
      .outputMode(OutputMode.Update()).start()

    input.addData(KeyedEvent("x", 1, ""), KeyedEvent("x", 2, ""),
      KeyedEvent("y", 3, ""))
    q.processAllAvailable()
    input.addData(KeyedEvent("x", 4, ""))
    q.processAllAvailable()
    // Update mode: latest row per key holds the cumulative count
    val last = spark.table("rc_out").as[KeyCount].collect()
      .groupBy(_.key).view.mapValues(_.map(_.n).max).toMap
    assert(last === Map("x" -> 3L, "y" -> 1L))
    q.stop()
  }
}

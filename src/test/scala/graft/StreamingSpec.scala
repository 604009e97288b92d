package graft

import graft.core.Tables
import graft.ops.EventOps
import graft.streaming.EventStreams
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming tier: the streaming pipelines must produce
  * exactly the batch mirrors' results when fed the same files
  * (Trigger.AvailableNow, complete mode so no window is withheld by the
  * watermark at end-of-stream).
  */
class StreamingSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events-stream")
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("streaming tumbling windows == batch mirror") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val got = rows(runComplete(EventStreams.tumbling(stream), "t_tumbling"))
    val want = rows(EventOps.tumbling(Tables.load(spark, sfDir, "events")))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming sliding windows == batch mirror") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val got = rows(runComplete(EventStreams.sliding(stream), "t_sliding"))
    val want = rows(EventOps.sliding(Tables.load(spark, sfDir, "events")))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming session windows == batch mirror") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val got = rows(runComplete(EventStreams.sessions(stream), "t_sessions"))
    val want = rows(EventOps.sessions(Tables.load(spark, sfDir, "events")))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join == batch interval join") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val q = EventStreams.intervalJoin(stream).writeStream
      .format("memory").queryName("t_ssjoin").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = rows(spark.table("t_ssjoin"))
    val want = rows(EventOps.intervalPurchaseClick(
      Tables.load(spark, sfDir, "events")))
    // inner stream-stream join emits every match (watermarks only bound
    // state), so the full batch result must appear
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming append mode emits only watermark-finalized windows") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val q = EventStreams.tumbling(stream).writeStream
      .format("memory").queryName("t_append").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val appended = rows(spark.table("t_append"))
    val all = rows(EventOps.tumbling(Tables.load(spark, sfDir, "events")))
    // append emits a (possibly empty) watermark-complete prefix of the
    // batch result, never anything outside it
    assert(appended.subsetOf(all))
  }
}

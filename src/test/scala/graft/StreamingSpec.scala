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

  test("stream-stream LEFT OUTER interval join == batch after flush") {
    import spark.implicits._
    // outer-side null rows only emit once the watermark passes their
    // join window, so append a late sentinel event (matches neither
    // side, advances BOTH watermarks) — then the streamed result must
    // equal the batch left join over the ORIGINAL events exactly
    val d = Files.createTempDirectory("graft-events-louter")
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val maxTs = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(org.apache.spark.sql.functions.max("ts")).head()
      .getAs[java.time.LocalDateTime](0)
    // Catalyst pushes the event-type filters THROUGH the watermark
    // nodes, so each branch's watermark only advances with its own
    // event type — a neutral sentinel advances neither. The sentinel
    // is therefore a purchase+click pair under a reserved user id
    // (they match each other; the reserved id is excluded from the
    // compare), which advances BOTH branch watermarks past every real
    // event; the final no-data batch then flushes all null rows.
    val sentinelUser = 999990L
    // LocalDateTime keeps the sentinel in the file's TIMESTAMP_NTZ
    // type; readEvents reinterprets naive-as-UTC for both alike
    val sentT = maxTs.plusHours(2)
    val tmp = Files.createTempDirectory("graft-sentinel")
    Seq(
      (999999991L, sentT, sentinelUser, "purchase", 0.0, "{}"),
      (999999992L, sentT, sentinelUser, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, d.resolve("zz_sentinel.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val stream = EventStreams.readEvents(spark, d.toString)
    val q = EventStreams.intervalJoinLeftOuter(stream).writeStream
      .format("memory").queryName("t_louter").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = rows(spark.table("t_louter")
      .filter(s"user_id != $sentinelUser"))
    val want = rows(EventOps.intervalPurchaseClickLeft(
      Tables.load(spark, sfDir, "events")))
    assert(got === want)
    // the outer extension is real: some purchases have no click
    assert(spark.table("t_louter").filter("click_id IS NULL").count() > 0)
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

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

  test("watermark drops a too-late row; an in-grace late row still lands") {
    // The state-bound contract in one test: after the watermark passes
    // a window's end, a row for that window is DISCARDED (its state is
    // gone — this is what makes streaming aggregation state finite);
    // a late row still inside the grace interval is ACCEPTED.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(sum("v").as("s"))
      .select(col("w.start").cast("long").as("ws"), col("s"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    input.addData((ts(5), 1L))     // window [0, 10)
    q.processAllAvailable()
    input.addData((ts(12), 10L))   // watermark -> 12 - 10 = 2; [0,10) open
    q.processAllAvailable()
    input.addData((ts(7), 100L))   // LATE but within grace: accepted
    q.processAllAvailable()
    input.addData((ts(35), 1000L)) // watermark -> 25; [0,10) finalized
    q.processAllAvailable()
    input.addData((ts(8), 7777L))  // TOO LATE: window state gone, dropped
    q.processAllAvailable()
    input.addData((ts(60), 1L))    // push watermark so [10,20)+[30,40) emit
    q.processAllAvailable()
    val got = spark.table("late_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w0 = ts(0).getTime / 1000
    // the in-grace late row (100) is in; the too-late row (7777) is NOT
    assert(got(w0) === 101L, s"window [0,10) must hold 1+100 only: $got")
    assert(!got.values.exists(_ >= 7777L), s"too-late row leaked: $got")
    q.stop()
  }

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

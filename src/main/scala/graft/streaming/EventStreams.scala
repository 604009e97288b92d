package graft.streaming

import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape: file-source
  * stream -> watermarked event-time windows -> sink.
  *
  * The transforms are shared with [[EventOps]] (same functions applied
  * to a streaming DataFrame), so batch and stream produce identical
  * results on identical input — asserted in StreamingSpec.
  *
  * Scale notes:
  *   - watermark (30 min) bounds state: expired windows/sessions are
  *     evicted instead of accumulating forever;
  *   - tumbling/sliding aggs are partial-aggregated before the state
  *     store shuffle (same hash partitioning as batch groupBy);
  *   - session windows use Spark's built-in session_window merge state;
  *   - output mode `update`/`append` chosen per sink semantics (append
  *     only emits finalized windows — what a downstream consumer of an
  *     exactly-once pipeline wants).
  */
object EventStreams {

  /** The parquet on-disk schema of events in the CURRENT generator
    * format: ts is TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    * Spark surfaces as TIMESTAMP_NTZ; see [[graft.core.Tables]].
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files,
    * normalized to the same shape batch [[EventOps.events]] sees.
    *
    * A streaming source must DECLARE its schema, so the on-disk ts
    * type is sniffed with a one-time batch footer read and the
    * matching normalization applied — the same two formats the batch
    * loader accepts (legacy TIMESTAMP(NANOS) surfacing as a long
    * under nanosAsLong, and the current NTZ micros), so streaming and
    * batch never disagree about which files they can ingest.
    *
    * When the directory is empty or does not exist yet (a stream
    * normally starts before its producer), the sniff cannot read a
    * footer and the source falls back to the CURRENT generator format
    * ([[rawSchema]]'s NTZ micros). The format is then locked for the
    * stream's lifetime — a dir that later receives files in the OTHER
    * ts format needs a restart (restart recovery is spec'd); mixing
    * both formats in one dir was never readable, batch or stream.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val onDiskTs =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException =>
        rawSchema("ts").dataType }
    val declared = StructType(rawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = onDiskTs)
      case f => f
    })
    val raw = spark.readStream.schema(declared).parquet(dir)
    onDiskTs match {
      case LongType =>
        // integer division: see graft.core.Tables (double division
        // loses sub-microsecond precision at nanosecond magnitudes)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // naive-as-UTC reinterpretation, identical to the batch loader
        // (session timezone is pinned to UTC in Graft.session)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Watermarked tumbling 1-hour aggregation (append mode compatible). */
  def tumbling(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    EventOps.tumbling(events.withWatermark("ts", watermark))

  /** Watermarked sliding windows. */
  def sliding(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    EventOps.sliding(events.withWatermark("ts", watermark))

  /** Watermarked session windows per user. */
  def sessions(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    EventOps.sessions(events.withWatermark("ts", watermark))

  /** Stream-stream interval join: purchases x the user's clicks in the
    * trailing 30 minutes — the streaming face of
    * [[EventOps.intervalPurchaseClick]]. The explicit time-range join
    * condition plus watermarks on BOTH sides is what lets Spark bound
    * the join state store (a buffered click is droppable once the
    * purchase-side watermark passes click time + window); without the
    * range condition the state would grow forever.
    */
  def intervalJoin(events: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val purchases = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("pts"))
    val clicks = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("cts"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_micros"))
  }

  /** Stream-stream LEFT OUTER interval join: every purchase emits,
    * with its preceding click when one exists and NULL click columns
    * otherwise. The outer side's null rows can only be emitted once
    * the watermark passes the join window's end (until then a matching
    * click could still arrive), so unmatched results trail the inner
    * ones by the watermark delay — the documented outer-join latency
    * contract of Structured Streaming, asserted against the batch
    * left join in StreamingSpec. State stays watermark-bounded on both
    * sides, exactly as the inner form.
    */
  def intervalJoinLeftOuter(
      events: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val purchases = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("pts"))
    val clicks = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("cts"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_micros"))
  }

  /** Convenience: one-shot processing of all currently-available input
    * (Trigger.AvailableNow) into an in-memory table named `queryName`.
    * Used by tests and local inspection; a production sink would be
    * kafka/parquet with checkpointing instead.
    */
  def runAvailableNow(
      df: DataFrame, queryName: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

package graft.tools

import graft.core.Graft
import graft.streaming.EventStreams
import org.apache.spark.sql.streaming.Trigger

/** CLI for the Structured Streaming pipelines: processes all events
  * parquet currently in <inputDir> (Trigger.AvailableNow) through the
  * chosen windowing and prints the first rows.
  *
  * Usage: runMain graft.tools.StreamMain <tumbling|sliding|sessions> <inputDir>
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: StreamMain <tumbling|sliding|sessions> <inputDir>")
      sys.exit(2)
    }
    val Array(mode, inputDir) = args
    val spark = Graft.session(appName = s"graft-stream-$mode")
    try {
      val events = EventStreams.readEvents(spark, inputDir)
      val pipeline = mode match {
        case "tumbling" => EventStreams.tumbling(events)
        case "sliding" => EventStreams.sliding(events)
        case "sessions" => EventStreams.sessions(events)
        case other =>
          System.err.println(s"unknown mode '$other'"); sys.exit(2)
      }
      val q = pipeline.writeStream
        .format("memory").queryName("stream_out")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.table("stream_out")
      println(s"[stream] $mode produced ${out.count()} rows; sample:")
      out.orderBy(out.columns.map(org.apache.spark.sql.functions.col): _*)
        .show(10, truncate = false)
    } finally spark.stop()
  }
}

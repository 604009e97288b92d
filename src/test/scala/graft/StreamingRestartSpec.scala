package graft

import graft.streaming.EventStreams
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.streaming.Trigger

/** Streaming exactly-once across restarts: a checkpointed file-sink
  * query processes each input file exactly once even when the query is
  * stopped and restarted with new data — the property the reference's
  * crash test wanted (`test-mr.sh:298-346`) and its O_APPEND shuffle
  * couldn't provide, delivered by checkpoint + idempotent sink commit.
  */
class StreamingRestartSpec extends SparkSpec {

  test("checkpointed parquet sink is exactly-once across restart") {
    val work = Files.createTempDirectory("graft-restart")
    val inDir = work.resolve("in"); Files.createDirectory(inDir)
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString

    // batch 1: half the events
    val all = graft.core.Tables.load(spark, sfDir, "events")
    val half1 = all.filter(org.apache.spark.sql.functions.col("event_id") < 500)
    val half2 = all.filter(org.apache.spark.sql.functions.col("event_id") >= 500)
    half1.write.mode("overwrite").parquet(inDir.resolve("b1").toString)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(half1.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$inDir/*")
      val q = stream.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === half1.count())

    // restart with more data: the old files must not be reprocessed
    half2.write.mode("overwrite").parquet(inDir.resolve("b2").toString)
    runOnce()
    val ids = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0))
    assert(ids.length === all.count().toInt, "no loss")
    assert(ids.distinct.length === ids.length, "no duplicates")

    // a third restart with no new data emits nothing new
    runOnce()
    assert(spark.read.parquet(outDir).count() === all.count())
  }

  test("dedup-on-arrival state survives a restart: dups stay suppressed") {
    val work = Files.createTempDirectory("graft-dedup-restart")
    val inDir = work.resolve("in"); Files.createDirectory(inDir)
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val docs = graft.core.Tables.load(spark, sfDir, "documents")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$inDir/*")
      val q = graft.streaming.DocStreams.dedupOnArrival(stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    docs.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b1").toString)
    runOnce()
    val keepSet = spark.read.parquet(outDir).count()
    assert(keepSet === graft.llm.Dedup.exact(docs).count())

    // RESTARTED query, second wave of re-keyed duplicates: the
    // recovered flatMapGroupsWithState store must still know every
    // content hash, so nothing new is emitted
    docs.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + 2000000L)
      .coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b2").toString)
    runOnce()
    assert(spark.read.parquet(outDir).count() === keepSet,
      "restarted state leaked second-wave duplicates")
  }

  test("kll feed state survives a restart: post-restart sketch == batch over both waves") {
    import org.apache.spark.sql.functions.{col, lit}
    val work = Files.createTempDirectory("graft-kll-restart")
    val inDir = work.resolve("in"); Files.createDirectory(inDir)
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val docs = graft.core.Tables.load(spark, sfDir, "documents")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$inDir/*")
      val q = graft.streaming.DocStreams.kllBySource(stream)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("bid", lit(id))
              .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    docs.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b1").toString)
    runOnce()
    // RESTARTED query, second wave (re-keyed ids, fresh hashes): the
    // recovered sample state must still hold wave-1's survivors, so
    // the final emission equals a batch sketch over BOTH waves
    val wave2 = docs.withColumn("doc_id", col("doc_id") + 2000000L)
    wave2.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b2").toString)
    runOnce()
    val out = spark.read.parquet(outDir)
    val lastBid = out.agg(org.apache.spark.sql.functions.max("bid"))
      .head().getLong(0)
    val got = out.filter(col("bid") === lastBid).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val want = graft.llm.CorpusOps.kllSketch(docs.unionByName(wave2))
      .collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === want,
      "post-restart sketch diverges from batch over both waves")
  }

  test("classifier feed state survives a restart: post-restart panel == batch over both waves") {
    import org.apache.spark.sql.functions.{col, lit}
    val work = Files.createTempDirectory("graft-cls-restart")
    val inDir = work.resolve("in"); Files.createDirectory(inDir)
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // the frozen model rides across the restart unchanged — only the
    // decile counters live in checkpointed state
    val w = graft.llm.Curation.trainedWeights(docs)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$inDir/*")
      val q = graft.streaming.DocStreams.classifierScoreFeed(stream, w)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("bid", lit(id))
              .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    docs.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b1").toString)
    runOnce()
    // RESTARTED query, second wave: the SAME texts under fresh ids —
    // scoring is text-only, so the recovered decile counters must land
    // on the wave-1 batch panel with every n_docs doubled and the
    // ratio columns unchanged ((2Σ)/(2n) truncates identically to Σ/n)
    docs.withColumn("doc_id", col("doc_id") + 2000000L)
      .coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b2").toString)
    runOnce()
    val out = spark.read.parquet(outDir)
    val lastBid = out.agg(org.apache.spark.sql.functions.max("bid"))
      .head().getLong(0)
    val got = out.filter(col("bid") === lastBid).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val want = graft.llm.Curation.classifierCalibration(docs).collect()
      .map(r => r.getLong(0) -> (2 * r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === want,
      "post-restart calibration panel diverges from batch over both waves")
  }

  test("golden-record feed: merge across a restart emits a tombstone; compaction == batch") {
    import org.apache.spark.sql.functions.{col, lit}
    val work = Files.createTempDirectory("graft-golden-restart")
    val inDir = work.resolve("in"); Files.createDirectory(inDir)
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    import spark.implicits._
    def frame(rows: Seq[(Long, String, String, String, Int, Double)]) =
      rows.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    // wave 1: entities {1}, {3}, {4} — 1 and 3 are TWO edits apart
    val w1 = frame(Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 10, 9.00),
      (3L, "red widgetxx", "Brand#1", "ECONOMY", 10, 8.00),
      (4L, "blue bolt", "Brand#1", "ECONOMY", 10, 7.00)))
    // wave 2 (after restart): 2 BRIDGES 1 and 3 (one edit to each) —
    // the recovered union-find must merge two pre-existing entities
    // and tombstone the absorbed root 3; 5 joins entity 4
    val w2 = frame(Seq(
      (2L, "red widgetx", "Brand#1", "ECONOMY", 10, 9.50),
      (5L, "blue bolt", "Brand#1", "ECONOMY", 10, 6.00)))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(w1.schema).parquet(s"$inDir/*")
      val q = graft.streaming.StatefulOps.goldenOnArrival(stream)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("bid", lit(id))
              .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    w1.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b1").toString)
    runOnce()
    w2.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b2").toString)
    runOnce()
    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // absorbed root 3 must be tombstoned in a later batch than its row
    val tomb3 = out.filter(r => r._1 == 3L && r._2 == 0L)
    val live3 = out.filter(r => r._1 == 3L && r._2 > 0L)
    assert(tomb3.nonEmpty, "merge must tombstone the absorbed entity id")
    assert(live3.nonEmpty && tomb3.map(_._7).max > live3.map(_._7).max)
    // compaction: latest bid per entity, tombstones dropped
    val compacted = out.groupBy(_._1).map { case (_, rs) =>
      val last = rs.maxBy(_._7)
      (last._1, last._2, last._3, last._4, last._5, last._6)
    }.filter(_._2 > 0L).toSet
    val want = graft.ops.EntityOps.goldenFrom(w1.unionByName(w2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(compacted === want,
      "compacted golden feed diverges from batch fusion over both waves")
  }
}

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

  test("streaming content dedup: simhash kernel + watermarked dropDuplicates") {
    // the custom codegen kernel runs inside Structured Streaming, and
    // dropDuplicatesWithinWatermark gives bounded-state streaming dedup
    // on the fingerprint — the streaming face of Dedup.simhash
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = input.toDS().toDF("doc_id", "ts", "text")
      .withColumn("sig", graft.functions.text.simhash64(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("sig")
    val q = out.writeStream.format("memory").queryName("sdd_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      (1L, ts(0), "hello world spark engine"),
      (2L, ts(1), "completely different content"),
      (3L, ts(2), "hello world spark engine")) // within-batch dup of 1
    q.processAllAvailable()
    input.addData(
      (4L, ts(3), "hello world spark engine"), // cross-batch dup, in watermark
      (5L, ts(4), "brand new material"))
    q.processAllAvailable()
    val ids = spark.table("sdd_out").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 5L))
    q.stop()
  }

  test("foreachBatch CDC loop: per-batch merge upsert into a parquet snapshot") {
    // the lakehouse write path: each micro-batch full-outer-merges into
    // the snapshot (latest value per key wins), so the table is always
    // a consistent upsert state — batch and stream share the merge shape
    import org.apache.spark.sql.{DataFrame, functions => F}
    implicit val sqlCtx = spark.sqlContext
    val snapDir = java.nio.file.Files
      .createTempDirectory("graft-cdc-snap").toString + "/snap"
    val input = MemoryStream[(Long, String, Long)] // key, value, seq
    def mergeBatch(batch: DataFrame, id: Long): Unit = {
      // latest row per key within the batch (highest seq)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(F.col("seq").desc)
      val updates = batch.toDF("k", "v", "seq")
        .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") === 1)
        .drop("rn")
      val base: DataFrame =
        if (new java.io.File(snapDir).exists())
          spark.read.parquet(snapDir)
        else updates.limit(0)
      val merged = base.as("b")
        .join(updates.as("u"), F.col("b.k") === F.col("u.k"), "full_outer")
        .select(
          F.coalesce(F.col("u.k"), F.col("b.k")).as("k"),
          F.coalesce(F.col("u.v"), F.col("b.v")).as("v"),
          F.coalesce(F.col("u.seq"), F.col("b.seq")).as("seq"))
      // write-then-swap keeps the snapshot readable mid-merge
      merged.write.mode("overwrite").parquet(snapDir + ".next")
      val fs = new java.io.File(snapDir)
      if (fs.exists()) scala.reflect.io.Directory(fs).deleteRecursively()
      new java.io.File(snapDir + ".next").renameTo(fs)
    }
    val q = input.toDS().toDF("k", "v", "seq").writeStream
      .foreachBatch(mergeBatch _).outputMode("append").start()
    input.addData((1L, "a1", 1L), (2L, "b1", 2L))
    q.processAllAvailable()
    input.addData((1L, "a2", 3L), (3L, "c1", 4L))
    q.processAllAvailable()
    input.addData((2L, "b2", 5L))
    q.processAllAvailable()
    q.stop()
    val snap = spark.read.parquet(snapDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap === Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))
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

  test("streaming decontamination == batch operator on the same corpus") {
    // stream-static shingle-hit join: documents arrive over two
    // micro-batches, the reference (eval) set is static; the streamed
    // result must equal Dedup.decontaminate over the unioned batches.
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].limit(300).collect()
    val ref = docs.filter(_._1 % 97 == 0)
    val corp = docs.filter(_._1 % 97 != 0)
    val (b1, b2) = corp.splitAt(corp.length / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val refDf = ref.toSeq.toDF("doc_id", "text")
    val q = graft.streaming.DocStreams.decontaminate(
        input.toDF().toDF("doc_id", "text"), refDf)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Update()).start()
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    // each doc_id lives in one micro-batch, so its latest update row is
    // its final count
    val streamed = spark.table("decon_out").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batch = graft.llm.Dedup.decontaminate(
        corp.toSeq.toDF("doc_id", "text"), refDf)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture corpus must contain contaminated docs")
    q.stop()
  }

  test("streaming classification == batch classifier on the same docs") {
    // stateless map operator: Append mode, no watermark, no state —
    // the streamed rows must be row-identical to the batch operator
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].limit(200).collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.classify(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("classify_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(b1.toSeq)
    input.addData(b2.toSeq)
    q.processAllAvailable()
    val streamed = spark.table("classify_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSet
    val batch = graft.llm.TextOps.classifierScore(
        docs.toSeq.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSet
    assert(streamed === batch)
    assert(batch.exists(_._5 == "keep") && batch.exists(_._5 == "drop"),
      "fixture must exercise both labels")
    q.stop()
  }

  test("streaming near-dup check == batch join; every plant flagged") {
    // stream-static ANN: incoming vectors probe the standing int8 IVF
    // index (stateless map + join, Append mode, no watermark); the
    // streamed matches must equal the same expression run in batch,
    // and planted exact duplicates must all be flagged
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val cents = graft.llm.Similarity.ivfCentroidsInt8(corpus)
    val index = graft.llm.Similarity.ivfIndexInt8(corpus, cents)
      .localCheckpoint()
    // incoming = exact copies of a 1-in-50 corpus slice under offset
    // ids (must flag: identical vectors quantize identically) over two
    // micro-batches
    val incoming = corpus.as[(Long, Seq[Float])].collect()
      .filter(_._1 % 50 == 0)
      .map { case (id, e) => (id + 20000000L, e) }
    val (b1, b2) = incoming.splitAt(incoming.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.DocStreams.nearDupMatches(
        input.toDF().toDF("vec_id", "embedding"), index, cents)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(b1.toSeq)
    input.addData(b2.toSeq)
    q.processAllAvailable()
    val streamed = spark.table("neardup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.streaming.DocStreams.nearDupMatches(
        incoming.toSeq.toDF("vec_id", "embedding"), index, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // every plant has its original in the corpus: self-similarity is
    // |qn|^2 >= the eps cut, so each plant must be flagged against it
    val flaggedAgainstOriginal = streamed.collect {
      case (qid, dup, _) if dup == qid - 20000000L => qid
    }
    val plants = incoming.map(_._1).toSet
    assert(plants.nonEmpty)
    assert(plants.subsetOf(flaggedAgainstOriginal.toSet),
      s"unflagged plants: ${plants -- flaggedAgainstOriginal.toSet}")
    q.stop()
  }

  test("streaming MG candidates cover exact frequent terms; recount == batch") {
    // tokens stream in over 3 micro-batches; each shard's Misra-Gries
    // state must, at end of stream, contain every token whose GLOBAL
    // count passes the frequent-items threshold — so the exact recount
    // over the final candidates equals the batch operator's answer.
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.core.Tables.load(spark, sfDir, "documents")
    val corp = docsDf.select("doc_id", "text").as[(Long, String)].collect()
    val chunks = corp.grouped((corp.length + 2) / 3).toSeq

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val toks = input.toDF().toDF("doc_id", "text")
      .select(explode(
        graft.llm.TextOps.letterTokens(col("text"))).as("tok"))
      .select(pmod(hash(col("tok")), lit(8)).cast("int").as("shard"),
        col("tok"))
      .as[graft.streaming.DocStreams.ShardTok]
    val q = graft.streaming.DocStreams.freqTermCandidates(toks, capacity = 128)
      .writeStream.format("memory").queryName("mg_out")
      .outputMode(OutputMode.Update()).start()
    chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }

    // final snapshot per shard = the rows carrying its max n_shard
    val snaps = spark.table("mg_out")
      .as[graft.streaming.DocStreams.MGSnapshot].collect()
    val finalCands = snaps.groupBy(_.shard).toSeq.flatMap { case (_, rows) =>
      val nMax = rows.map(_.n_shard).max
      rows.filter(_.n_shard == nMax).map(_.tok).toSeq
    }.toSet

    val phi = 0.02
    val counts = docsDf
      .select(explode(graft.llm.TextOps.letterTokens(col("text"))).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    val exact = counts.filter(_._2 >= math.ceil(phi * n).toLong)
    assert(exact.nonEmpty, "fixture should have frequent terms")
    assert(exact.keySet.subsetOf(finalCands),
      s"missing: ${exact.keySet -- finalCands}")

    // recount candidates exactly == batch operator
    val recount = counts.view.filterKeys(finalCands)
      .filter(_._2 >= math.ceil(phi * n).toLong).toMap
    val batch = graft.llm.CorpusOps.freqTerms(docsDf, phi = phi)
      .select("word", "cnt").as[(String, Long)].collect().toMap
    assert(recount === batch)
    q.stop()
  }

  test("streaming scd2 changes == batch interval starts after replay") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = graft.core.Tables.load(spark, sfDir, "events")
    // point the file source at a dir with ONLY the events file
    val d = java.nio.file.Files.createTempDirectory("graft-scd2-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.scd2Changes(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("scd2_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = graft.ops.EventOps.scd2Intervals(events)
      .select(col("user_id"), col("state"), unix_micros(col("valid_from")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    q.stop()
  }

  test("streaming PIT feature feed == batch featuresAtPurchase after replay") {
    import org.apache.spark.sql.functions.col
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-feature-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.featureFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("feature_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // row-for-row: purchase_id -> (state-or-null, value_cents); the
    // batch left join's NULL-state purchases must appear as None here
    val got = spark.table("feature_out").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(3)), r.getLong(4)))).toMap
    val want = graft.ops.EventOps.featuresAtPurchase(events)
      .select(col("purchase_id"), col("state"), col("value_cents"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.values.exists(_._1.isEmpty),
      "corpus should exercise the before-first-state None path")
    assert(got.values.count(_._1.nonEmpty) > got.size / 2)
    q.stop()
  }

  test("forecast-residual feed == in-memory ring replay over real events") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-resid-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.forecastResidualFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("resid_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("resid_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    // independent replay: per band, dense day series from the band's
    // first purchase day, pred = value 7 days earlier, closed days only
    val rows = events.filter(col("event_type") === "purchase")
      .select((col("user_id") % 3).as("band"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).flatMap { case (band, rs) =>
      val byDay = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val d0 = byDay.keys.min
      val dLast = byDay.keys.max
      // closed days = all but the band's final day
      (d0 until dLast).flatMap { day =>
        if (day - 7 >= d0) {
          val actual = byDay.getOrElse(day, 0L)
          val pred = byDay.getOrElse(day - 7, 0L)
          Some((band, day) -> ((actual, pred, math.abs(actual - pred))))
        } else None
      }
    }.toMap
    assert(got === want)
    q.stop()
  }

  test("holt feed == in-memory level/trend replay over real events") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-holt-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.holtFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("holt_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("holt_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    // independent replay: per band from the band's first purchase day,
    // zero-filled days, level/trend recurrence, closed days only
    def idiv(x: Long, y: Long): Long = {
      val q0 = math.abs(x) / math.abs(y)
      if ((x >= 0) == (y >= 0)) q0 else -q0
    }
    val rows = events.filter(col("event_type") === "purchase")
      .select((col("user_id") % 3).as("band"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).flatMap { case (band, rs) =>
      val byDay = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val d0 = byDay.keys.min
      val dLast = byDay.keys.max
      var level = byDay(d0); var trend = 0L
      // closed days after the init day = d0+1 until dLast (exclusive:
      // the final day stays open)
      (d0 + 1 until dLast).map { day =>
        val y = byDay.getOrElse(day, 0L)
        val fc = level + trend
        val row = (band, day) -> ((y, fc, math.abs(y - fc)))
        val nl = idiv(300L * y + 700L * fc, 1000L)
        trend = idiv(100L * (nl - level) + 900L * trend, 1000L)
        level = nl
        row
      }
    }.toMap
    assert(got === want)
    q.stop()
  }

  test("session-path feed == batch panel minus each user's open final session") {
    import org.apache.spark.sql.functions.col
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-paths-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.sessionPathFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("paths_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("paths_out").collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    // in-memory replay: closed sessions + the final open one per user
    val evs = events
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    var closed = List.empty[String]
    var finals = List.empty[String]
    evs.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      var cur = List.empty[String]
      var last = Long.MinValue
      sorted.foreach { case (_, _, us, typ) =>
        if (cur.nonEmpty && us - last > 600L * 1000000L) {
          closed ::= cur.reverse.take(3).mkString(">")
          cur = Nil
        }
        cur ::= typ
        last = us
      }
      if (cur.nonEmpty) finals ::= cur.reverse.take(3).mkString(">")
    }
    val wantClosed = closed.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    assert(streamed === wantClosed)
    assert(streamed.nonEmpty)
    // and closed + finals together reproduce the BATCH panel exactly
    val batch = graft.ops.EventOps.sessionPaths(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val together = (closed ++ finals).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(together === batch)
    q.stop()
  }

  test("streaming conversion-lag feed folds to the batch quantile panel") {
    import org.apache.spark.sql.functions.col
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-convlag-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.conversionLagFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("convlag_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("convlag_out").collect()
      .map(r => (r.getLong(2), r.getLong(3))) // (dow, lag_sec)
    assert(rows.nonEmpty)
    // fold the emitted rows into the exact type-1 quantile panel and
    // compare against the batch statement
    val want = graft.ops.EventOps.conversionLag(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val got = rows.groupBy(_._1).map { case (dow, ls) =>
      val s = ls.map(_._2).sorted
      val n = s.length
      def q1(i: Int) = s((i * n + 3) / 4 - 1)
      dow -> ((n.toLong, s.head, q1(1), q1(2), q1(3), s.last))
    }
    assert(got === want)
  }

  test("abFeed deltas sum to the batch A/B panel; once-per-user increments") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val q = StatefulOps.abFeed(spark,
        input.toDS().toDF("user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("ab_out")
      .outputMode(OutputMode.Append()).start()
    // batch 1: u1 views, u2 converts, u3 errors
    input.addData((1L, "view", 0.0), (2L, "purchase", 10.0),
      (3L, "error", 0.0))
    q.processAllAvailable()
    // batch 2: u1 converts NOW, u2 buys again (already a converter),
    // u4 is new
    input.addData((1L, "purchase", 2.5), (2L, "purchase", 1.0),
      (4L, "view", 0.0))
    q.processAllAvailable()
    val deltas = spark.table("ab_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // once-per-user: 4 distinct users, and exactly 2 conversion events
    // (u1 and u2 each convert once across the whole stream)
    assert(deltas.map(_._2).sum === 4L, "d_users must count each user once")
    assert(deltas.map(_._3).sum === 2L,
      "d_converters must fire once per converting user")
    // replay the same rows through the batch panel and compare raw sums
    val allRows = Seq(
      (1L, "view", 0.0), (2L, "purchase", 10.0), (3L, "error", 0.0),
      (1L, "purchase", 2.5), (2L, "purchase", 1.0), (4L, "view", 0.0))
    val ev = allRows.zipWithIndex.map { case ((u, ty, v), i) =>
      (i.toLong, java.time.LocalDateTime.of(2026, 3, 1, 0, i), u, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val want = graft.ops.EventOps.abExperiment(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val got = deltas.groupBy(_._1).map { case (v, ds) =>
      val users = ds.map(_._2).sum
      val conv = ds.map(_._3).sum
      val purch = ds.map(_._4).sum
      val cents = ds.map(_._5).sum
      val nEv = ds.map(_._6).sum
      val nErr = ds.map(_._7).sum
      v -> (users, conv, conv * 1000 / users, purch, cents, cents / users,
        nErr * 1000 / nEv)
    }
    got.foreach { case (v, p) =>
      assert(want(v) === p, s"variant $v: streamed deltas != batch panel")
    }
    assert(got.keySet === want.keySet - "B-A")
    q.stop()
  }

  test("streaming attribution feed == batch attribution after replay") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-attr-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.attributionFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("attr_out")
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("rnk") === 1L, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("rnk") === col("n_t"), 1L).otherwise(0L)).as("n_last"),
        sum(when(col("rnk") === 1L, col("p_cents")).otherwise(0L))
          .as("first_cents"),
        sum(when(col("rnk") === col("n_t"), col("p_cents")).otherwise(0L))
          .as("last_cents"),
        sum(col("lin_cents")).as("linear_cents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val want = graft.ops.EventOps.attribution(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got === want)
    assert(got.contains("direct") && got.size >= 4)
    q.stop()
  }

  test("streaming transition feed == batch markov counts after replay") {
    import org.apache.spark.sql.functions.col
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val d = java.nio.file.Files.createTempDirectory("graft-markov-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StatefulOps.transitionFeed(spark,
        graft.streaming.EventStreams.readEvents(spark, d.toString))
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("trans_out")
      .groupBy("prev_type", "next_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.ops.EventOps.markovTransitions(events)
      .select(col("prev_type"), col("next_type"), col("n_trans")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.nonEmpty)
    q.stop()
  }

  test("streaming hll registers: final per-source sketch == batch sketch") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-hll")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.hllBySource(stream)
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest emission per source (update mode appends each refresh)
    val got = spark.table("hll_out").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val want = graft.llm.CorpusOps.hllMergeBySource(batchDocs)
      .filter(col("source") =!= "__all__").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got === want)
    q.stop()
  }

  test("streaming CMS watchlist: final estimates == batch cell minima") {
    import org.apache.spark.sql.functions.{col, desc, explode}
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import graft.llm.{CorpusOps, TextOps}
    val d = Files.createTempDirectory("graft-docs-cms")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val toks = batchDocs.select(col("source"),
      explode(TextOps.wsTokens(col("text"))).as("t"))
    // watch the two most frequent corpus terms plus one absent term
    val watch = toks.groupBy("t").count()
      .orderBy(desc("count"), col("t")).limit(2)
      .collect().map(_.getString(0)).toSeq :+ "zzz-not-in-the-corpus"
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.cmsWatch(stream, watch)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("cms_out").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch replay: per-source cell table, watch estimates = min over rows
    val sources = batchDocs.select("source").distinct()
      .collect().map(_.getString(0))
    val want = sources.flatMap { src =>
      val cells = CorpusOps.cmsCells(
        toks.filter(col("source") === src).select("t")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      watch.map { t =>
        (src, t) -> (0 until CorpusOps.CmsDepth).map(j =>
          cells.getOrElse((j, CorpusOps.cmsBucketScala(j, t).toLong), 0L)).min
      }
    }.toMap
    assert(got === want)
    // the heavy watch terms must register somewhere; estimates are
    // one-sided so a present term can never price at zero everywhere
    assert(watch.take(2).exists(t =>
      sources.exists(s => got((s, t)) > 0L)))
    q.stop()
  }

  test("streaming CMS feed: final per-source cell table == batch " +
      "cmsCells bit-for-bit") {
    import org.apache.spark.sql.functions.{col, explode}
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import graft.llm.{CorpusOps, TextOps}
    val d = Files.createTempDirectory("graft-docs-cmsfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.cmsBySource(stream)
      .writeStream.format("memory").queryName("cmsfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest emission wins per (source, j, bucket): update-mode
    // refreshes append in order, toMap keeps the last
    val got = spark.table("cmsfeed_out").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val toks = batchDocs.select(col("source"),
      explode(TextOps.wsTokens(col("text"))).as("t"))
    val sources = batchDocs.select("source").distinct()
      .collect().map(_.getString(0))
    val want = sources.flatMap { src =>
      CorpusOps.cmsCells(toks.filter(col("source") === src).select("t"))
        .collect()
        .map(r => (src, r.getInt(0), r.getLong(1)) -> r.getLong(2))
    }.toMap
    assert(got === want, "streamed sketch cells diverge from batch cmsCells")
    q.stop()
  }

  test("streaming quantile feed: final per-source row == batch sketch columns") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-qfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.quantileBySource(stream)
      .writeStream.format("memory").queryName("qfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per source
    val got = spark.table("qfeed_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val want = graft.llm.CorpusOps.quantileSketch(batchDocs).collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === want, "streamed quantile sketch diverges from batch")
    // the exact median must land inside every streamed bracket — the
    // 2x promise the feed inherits from the histogram
    val exact = graft.llm.CorpusOps.quantileSketch(batchDocs).collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    got.foreach { case (s, (_, _, lo, hi)) =>
      assert(exact(s) >= lo && exact(s) <= hi, s"bracket miss for $s")
    }
    q.stop()
  }

  test("streaming drift monitor: replay == independent in-memory PSI") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-emb-driftfeed")
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"),
      d.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchEmb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val baseline = batchEmb.filter(col("vec_id") % 2 === 0)
    val current = batchEmb.filter(col("vec_id") % 2 === 1)
    val stream = spark.readStream.schema(batchEmb.schema)
      .parquet(d.toString)
      .filter(col("vec_id") % 2 === 1)
    val q = graft.streaming.DocStreams.driftFeed(baseline, stream)
      .writeStream.format("memory").queryName("driftfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("driftfeed_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    val (nSeen, psi) = rows.maxBy(_._1)
    assert(nSeen === current.count())
    // independent replay: axis trained on the BASELINE only (the
    // monitor's honest production shape — the batch panel trains on
    // the union, documented difference), same buckets, same formula
    val v1s = graft.llm.Similarity.pc1SignedMicro(baseline)
    def hist(e: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.llm.Similarity.withUnitQuantized(e)
        .collect()
        .map { r =>
          val qn = r.getSeq[Long](1)
          val s = (0 until 64).foldLeft(0L)((a, i) => a + qn(i) * v1s(i))
          graft.llm.Similarity.driftBucket(s)
        }
        .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val bh = hist(baseline)
    val ch = hist(current)
    val buckets = (bh.keySet ++ ch.keySet).toSeq.sorted
    val (nb, nc, nB) = (bh.values.sum, ch.values.sum, buckets.length)
    val want = buckets.iterator.map { b =>
      val p = (bh.getOrElse(b, 0L) + 1).toDouble / (nb + nB)
      val qd = (ch.getOrElse(b, 0L) + 1).toDouble / (nc + nB)
      (p - qd) * math.log(p / qd)
    }.sum
    assert(math.abs(psi - want) < 2e-6,
      s"streamed PSI $psi diverges from replay $want")
    // PSI is a Gibbs-style sum of same-sign terms: never negative
    assert(psi >= 0.0)
    q.stop()
  }

  test("streaming scatter feed: final per-label row == batch scatterByLabel") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-emb-scatterfeed")
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"),
      d.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchEmb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val stream = spark.readStream.schema(batchEmb.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.scatterByLabelFeed(stream)
      .writeStream.format("memory").queryName("scatterfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per label
    val got = spark.table("scatterfeed_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val want = graft.llm.Similarity.scatterByLabel(batchEmb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === want, "streamed scatter panel diverges from batch")
    q.stop()
  }

  test("streaming reservoir feed: final per-group sample == batch samplePerGroup") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-resfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.samplePerGroupFeed(stream)
      .writeStream.format("memory").queryName("resfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per (group, rn) slot
    val got = spark.table("resfeed_out").collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(1)).toMap
    val want = graft.llm.Sampling.samplePerGroup(batchDocs, "lang").collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(got === want, "streamed reservoir diverges from batch")
    q.stop()
  }

  test("streaming KLL feed: final per-source row == batch sketch columns") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-kllfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.kllBySource(stream)
      .writeStream.format("memory").queryName("kllfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per source
    val got = spark.table("kllfeed_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // batch panel columns (n_docs, level_h, sketch_size, est_p50)
    val want = graft.llm.CorpusOps.kllSketch(batchDocs).collect()
      .filter(_.getString(0) != "__all__")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === want, "streamed KLL sketch diverges from batch")
    q.stop()
  }

  test("streaming blocklist feed: final per-source row == batch audit") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-blockfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.blocklistBySource(stream)
      .writeStream.format("memory").queryName("blockfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per source
    val got = spark.table("blockfeed_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val want = graft.llm.Curation.blocklistAudit(batchDocs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === want, "streamed blocklist audit diverges from batch")
    assert(got.values.map(_._1).sum === batchDocs.count())
    q.stop()
  }

  test("streaming classifier-score feed: final calibration panel == batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-clsfeed")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    // freeze the model trained on this exact corpus (deterministic
    // full-batch GD, so it matches classifierCalibration's internal
    // re-train bit-for-bit), then replay the corpus through the scorer
    val w = graft.llm.Curation.trainedWeights(batchDocs)
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.classifierScoreFeed(stream, w)
      .writeStream.format("memory").queryName("clsfeed_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest refresh wins per decile
    val got = spark.table("clsfeed_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val want = graft.llm.Curation.classifierCalibration(batchDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === want, "streamed calibration panel diverges from batch")
    assert(got.values.map(_._1).sum === batchDocs.count())
    q.stop()
  }

  test("streaming linkage-on-arrival: replay emits exactly the batch pair set") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-parts-link")
    val batchParts = graft.core.Tables.load(spark, sfDir, "part")
    val corpus = graft.ops.EntityOps.withVariants(batchParts)
    corpus.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("b1").toString)
    val stream = spark.readStream.schema(corpus.schema).parquet(s"$d/*")
    val q = graft.streaming.StatefulOps.linkageOnArrival(stream)
      .writeStream.format("memory").queryName("link_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("link_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // same corpus derivation as the registered query — exact pair-set
    // equality, each pair exactly once (no duplicates: count == size)
    val want = graft.ops.EntityOps.entityPairs(batchParts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "streamed linkage diverges from batch pairs")
    assert(spark.table("link_out").count() === got.size,
      "a pair was emitted more than once")
    q.stop()
  }

  test("editDistance counts code points: supplementary-plane char is one edit") {
    // "a😀b" vs "ab": one insert to both Spark's levenshtein and
    // DuckDB's (they count code points); a UTF-16 char loop says 2
    assert(StatefulOps.editDistance("a😀b", "ab") === 1)
    assert(StatefulOps.editDistance("😀", "😁") === 1)
    assert(StatefulOps.editDistance("", "😀") === 1)
    // and it still matches Spark's expression on BMP text
    assert(StatefulOps.editDistance("red widget", "red widgex") === 1)
    val sparkSays = spark.sql(
      "SELECT levenshtein('a😀b', 'ab')").collect()(0).getInt(0)
    assert(sparkSays === 1, "Spark levenshtein contract changed")
  }

  // NOTE on TTL tests: processAllAvailable() NEVER RETURNS on a
  // ProcessingTimeTimeout query — the operator's shouldRunAnotherBatch
  // is permanently true (a timeout may fire any moment), so the engine
  // keeps constructing batches and the no-new-data latch never sets.
  // These tests therefore poll the sink/state metrics under a deadline
  // (the engine self-triggers; a throttled trigger bounds the spin) and
  // stop the query in a finally.
  private def awaitTtl(deadlineSec: Int)(done: () => Boolean): Boolean = {
    val deadline = System.nanoTime() + deadlineSec * 1000L * 1000 * 1000
    while (!done() && System.nanoTime() < deadline) Thread.sleep(200)
    done()
  }

  test("linkage TTL: idle block evicted at the horizon; fresh window == batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Int, Double)]
    val stream = input.toDF().toDF("p_partkey", "p_name", "p_brand",
      "p_type", "p_size", "p_retailprice")
    val q = StatefulOps.linkageOnArrival(stream, stateTtl = Some("2 seconds"))
      .writeStream.format("memory").queryName("link_ttl_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    try {
      def pairs() = spark.table("link_ttl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def stateRows() = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      // window 1: block A pairs internally
      input.addData((1L, "red widget", "Brand#1", "ECONOMY", 10, 9.0),
        (2L, "red widgex", "Brand#1", "ECONOMY", 10, 8.0))
      assert(awaitTtl(30)(() => pairs() == Set((1L, 2L, 1L))),
        s"window-1 pair not emitted: ${pairs()}")
      assert(awaitTtl(30)(() => stateRows() == 1L),
        "block A should hold one state row")
      // horizon passes idle; an engine-scheduled timeout batch (or the
      // block-B batch) evicts A — observable as the state count
      // holding at 1 AFTER B's state lands (A out, B in)
      Thread.sleep(2500)
      input.addData((10L, "blue gadget", "Brand#2", "STANDARD", 5, 3.0))
      assert(awaitTtl(30)(() => stateRows() == 1L),
        s"block A state not evicted at the linkage horizon: ${stateRows()}")
      // fresh window: 3 matches evicted 1/2's names but must pair only
      // with 4 — the fresh window behaves like a fresh batch run
      input.addData((3L, "red widget", "Brand#1", "ECONOMY", 10, 7.0),
        (4L, "red widgex", "Brand#1", "ECONOMY", 10, 6.0))
      assert(awaitTtl(30)(() => pairs() == Set((1L, 2L, 1L), (3L, 4L, 1L))),
        s"pairs crossed the horizon or fresh window lost a pair: ${pairs()}")
    } finally q.stop()
  }

  test("golden TTL: evicted block restarts fusion; fresh window == batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Int, Double)]
    val stream = input.toDF().toDF("p_partkey", "p_name", "p_brand",
      "p_type", "p_size", "p_retailprice")
    val q = StatefulOps.goldenOnArrival(stream, stateTtl = Some("2 seconds"))
      .writeStream.format("memory").queryName("golden_ttl_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    try {
      def rows() = spark.table("golden_ttl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
        .toSet
      def stateRows() = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      input.addData((1L, "red widget", "Brand#1", "ECONOMY", 10, 9.0),
        (2L, "red widgex", "Brand#1", "ECONOMY", 10, 8.0))
      assert(awaitTtl(30)(() => rows().contains((1L, 2L, "red widget", 800L))),
        s"window-1 fusion missing: ${rows()}")
      Thread.sleep(2500)
      input.addData((10L, "blue gadget", "Brand#2", "STANDARD", 5, 3.0))
      assert(awaitTtl(30)(() => stateRows() == 1L),
        s"block A golden state not evicted: ${stateRows()}")
      // fresh window: 3 fuses alone (1/2 evicted), a NEW entity 3 —
      // exactly what a batch run over the fresh window computes
      input.addData((3L, "red widget", "Brand#1", "ECONOMY", 10, 7.0))
      assert(awaitTtl(30)(() => rows().contains((3L, 1L, "red widget", 700L))),
        s"fresh-window singleton missing or fused across horizon: ${rows()}")
    } finally q.stop()
  }

  test("golden feed: null-price listings fuse like batch (range skips them)") {
    import java.nio.file.Files
    import spark.implicits._
    val d = Files.createTempDirectory("graft-golden-nullprice")
    // 4 pairs with 1 (identical name, same block) but is unpriced —
    // batch fuses them with the price range from 1 alone; 5 is a lone
    // unpriced blockable singleton -> null lo/hi in batch, so the
    // stream must emit null too (r14 advice: this row used to abort
    // the query on the non-nullable cents encoder)
    val p = Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 10,
        java.lang.Double.valueOf(9.0)),
      (4L, "red widget", "Brand#1", "ECONOMY", 10,
        null.asInstanceOf[java.lang.Double]),
      (5L, "green thing", "Brand#9", "STANDARD", 3,
        null.asInstanceOf[java.lang.Double]))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    p.coalesce(1).write.mode("overwrite").parquet(d.resolve("b1").toString)
    val stream = spark.readStream.schema(p.schema).parquet(s"$d/*")
    val q = graft.streaming.StatefulOps.goldenOnArrival(stream)
      .writeStream.format("memory").queryName("golden_nullprice_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
    val got = spark.table("golden_nullprice_out").collect().map(key).toSet
    val want = graft.ops.EntityOps.goldenFrom(p).collect().map(key).toSet
    assert(got === want, "null-price fusion diverges from batch")
    assert(want.exists(w => w._1 === 5L && w._5.isEmpty),
      "fixture lost its all-null-price entity")
    q.stop()
  }

  test("streaming schema-drift feed: replay == batch variant panel; planted drift alarms") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.functions.lit
    val d = Files.createTempDirectory("graft-events-schdrift")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchEvents = graft.core.Tables.load(spark, sfDir, "events")
    // plant one drifted producer row: a second props shape for a new
    // event_type so the alarm has something to fire on
    import spark.implicits._
    batchEvents.limit(1)
      .withColumn("event_type", lit("drifty"))
      .withColumn("props", lit("""{"k": 1}"""))
      .unionByName(batchEvents.limit(1)
        .withColumn("event_type", lit("drifty"))
        .withColumn("props", lit("""{"k": 1, "x": "s"}""")))
      .coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("extra.parquet").toString)
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(s"$d/*")
    val q = graft.streaming.StatefulOps.schemaDriftFeed(stream)
      .writeStream.format("memory").queryName("schdrift_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("schdrift_out").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // planted type: two shapes -> drifted
    assert(got("drifty") === ((2L, 2L, true)))
    // real types: uniform shape -> never drifted; counts == batch panel
    val want = graft.ops.EventOps.variantExtract(batchEvents).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(6))).toMap
    want.foreach { case (typ, (n, nSchemas)) =>
      assert(got(typ) === ((n, nSchemas, false)),
        s"$typ diverges from batch variant panel")
    }
    q.stop()
  }

  test("golden feed: null-block/null-name rows fuse as singletons, matching batch") {
    import java.nio.file.Files
    import spark.implicits._
    val d = Files.createTempDirectory("graft-golden-nulls")
    // 2 has a null NAME (same block as 1 — must NOT pair: batch
    // levenshtein is null), 3 a null BRAND (cannot block) — batch
    // fuses both as singletons via its left join, so the feed must too
    val p = Seq(
      (1L, "red widget", "Brand#1", "ECONOMY", 10, 9.0),
      (2L, null.asInstanceOf[String], "Brand#1", "ECONOMY", 10, 8.0),
      (3L, "red widget", null.asInstanceOf[String], "ECONOMY", 10, 7.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    p.coalesce(1).write.mode("overwrite").parquet(d.resolve("b1").toString)
    val stream = spark.readStream.schema(p.schema).parquet(s"$d/*")
    val q = graft.streaming.StatefulOps.goldenOnArrival(stream)
      .writeStream.format("memory").queryName("golden_nulls_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.toString), r.getLong(4), r.getLong(5))
    val got = spark.table("golden_nulls_out").collect().map(key).toSet
    val want = graft.ops.EntityOps.goldenFrom(p).collect().map(key).toSet
    assert(got === want, "null-keyed singletons diverge from batch fusion")
    q.stop()
  }

  test("streaming golden-record feed: full-corpus replay compacts to batch fusion") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-parts-golden")
    val batchParts = graft.core.Tables.load(spark, sfDir, "part")
    val corpus = graft.ops.EntityOps.withVariants(batchParts)
    corpus.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("b1").toString)
    val stream = spark.readStream.schema(corpus.schema).parquet(s"$d/*")
    val q = graft.streaming.StatefulOps.goldenOnArrival(stream)
      .writeStream.format("memory").queryName("golden_out")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // single replay: every entity's latest (only) live row must equal
    // the batch fusion panel exactly
    val got = spark.table("golden_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
      .filter(_._2 > 0L).toSet
    val want = graft.ops.EntityOps.goldenRecords(batchParts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want, "streamed golden records diverge from batch fusion")
    q.stop()
  }

  test("streaming dedup-on-arrival: replay == batch; later dups suppressed") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft-docs-dedup")
    val ck = Files.createTempDirectory("graft-dedup-ck")
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val q = graft.streaming.DocStreams.dedupOnArrival(stream)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ck.toString)
      .start()
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    val afterFirst = spark.table("dedup_out").count()
    // second wave: the same texts under fresh ids — every one a
    // duplicate of standing state, so NOTHING new may be emitted
    batchDocs.withColumn("doc_id", col("doc_id") + 1000000L)
      .coalesce(1).write.mode("append").parquet(d.toString)
    q.processAllAvailable()
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length.toLong === afterFirst,
      "second-wave duplicates leaked through standing state")
    val want = graft.llm.Dedup.exact(batchDocs)
      .select("text_hash", "keep_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.toSet === want)
    q.stop()
  }
}

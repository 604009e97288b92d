package graft

import graft.core.Tables
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Storage-layout tier: the two layout techniques that remove shuffles
  * and IO at cluster scale — bucketing (co-located joins) and partition
  * pruning — demonstrated and asserted on the physical plan.
  */
class StorageSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bucketed tables join without any Exchange (co-located join)") {
    // warehouse.dir is static; bucketed tables land in ./spark-warehouse
    // (gitignored) under the test JVM's cwd. Clean any residue from
    // prior runs (a crashed run can leave the dir without the table).
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists())
        scala.reflect.io.Directory(dir).deleteRecursively()
    }
    Tables.load(spark, sfDir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.load(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("q"))
    // disable auto-broadcast: at test scale the dim fits in broadcast,
    // which would bypass the bucketed-join path this test demonstrates
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = try plan(joined)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
    val exchanges = p.linesIterator
      .count(l => l.trim.startsWith("(") && l.contains(" Exchange") &&
        !l.contains("Broadcast"))
    // join side exchanges eliminated by bucketing; only the final
    // 1-column groupBy may shuffle
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    assert(exchanges <= 1, s"bucketed join should not shuffle join keys:\n$p")
    assert(p.contains("Bucketed: true"), s"scan not bucket-aware:\n$p")
    // and it's still correct
    val direct = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    assert(joined.collect().map(_.mkString("|")).sorted.toSeq ===
      direct.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("partitioned parquet writes prune partitions on read") {
    val base = Files.createTempDirectory("graft-part").toString
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$base/events")
    val read = spark.read.parquet(s"$base/events")
      .filter(col("day") === "2024-01-02")
    val p = plan(read)
    assert(p.contains("PartitionFilters: [isnotnull(day"),
      s"no partition pruning:\n$p")
    val expected = ev.filter(col("day") === "2024-01-02").count()
    assert(read.count() === expected)
    assert(expected > 0)
  }

  test("z-order layout tightens per-file ranges on EVERY dimension") {
    import spark.implicits._
    // 2-D uniform data; a single-column sort would tighten only that
    // column's per-file stats, z-order must tighten both
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(40000)((rnd.nextInt(1 << 12), rnd.nextInt(1 << 12)))
      .toDF("a", "b")
    val dir = Files.createTempDirectory("graft-zorder").toString
    graft.core.Layout.zorder(df, Seq("a", "b"), bits = 12, partitions = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.orderBy("a").repartitionByRange(16, col("a"))
      .write.mode("overwrite").parquet(s"$dir/plain")
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Int]("span").toDouble)
      spans.sum / spans.length
    }
    val full = (1 << 12).toDouble
    // plain range layout: a is tight, b spans nearly everything
    assert(avgSpan(s"$dir/plain", "a") < 0.2 * full)
    assert(avgSpan(s"$dir/plain", "b") > 0.8 * full)
    // z-order: BOTH dimensions well under the full range
    val za = avgSpan(s"$dir/z", "a")
    val zb = avgSpan(s"$dir/z", "b")
    assert(za < 0.6 * full, s"z a-span $za")
    assert(zb < 0.6 * full, s"z b-span $zb")
  }

  test("ANALYZE TABLE statistics reach the optimizer (CBO)") {
    val keepCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
      Tables.load(spark, sfDir, "orders")
        .write.mode("overwrite").saveAsTable("graft_stats_t")
      spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS " +
        "FOR COLUMNS o_custkey")
      val stats = spark.table("graft_stats_t")
        .queryExecution.optimizedPlan.stats
      val expected = Tables.load(spark, sfDir, "orders").count()
      assert(stats.rowCount.exists(_.toLong == expected),
        s"rowCount stat missing/wrong: ${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "no column stats")
      val cs = stats.attributeStats.head._2
      assert(cs.distinctCount.isDefined, "no NDV for analyzed column")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
      spark.conf.set("spark.sql.cbo.enabled", keepCbo)
    }
  }

  test("compactDir: many small files -> size-targeted few, lossless") {
    val src = Files.createTempDirectory("graft-compact-in").toString
    val dst = Files.createTempDirectory("graft-compact-out").toString
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    // simulate a fine-grained incremental writer: 64 tiny files
    li.repartition(64).write.mode("overwrite").parquet(src)
    val target = 64L << 10
    val (before, after, total) =
      graft.core.Layout.compactDir(spark, src, dst, target)
    assert(before === 64)
    assert(after === ((total + target - 1) / target).toInt)
    assert(after < before, s"compaction must reduce files ($total bytes)")
    // lossless: exact multiset of rows survives
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(_.mkString("|")).sorted.toSeq
    assert(rows(dst) === rows(src))
  }

  test("schema evolution: mergeSchema unions writer generations") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    import spark.implicits._
    // generation 1: (id, v); generation 2 adds a quality column
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9L)).toDF("id", "v", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "quality", "v"))
    val got = merged.collect().map(r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("v")),
        if (r.isNullAt(r.fieldIndex("quality"))) -1L
        else r.getLong(r.fieldIndex("quality")))).sortBy(_._1).toSeq
    // old-generation rows surface NULL for the new column
    assert(got === Seq((1L, "a", -1L), (2L, "b", -1L), (3L, "c", 9L)))
    // and a projection that only needs gen-1 columns still prunes to
    // them (ReadSchema must not drag the merged superset along)
    val p = plan(merged.select("id"))
    assert(p.contains("ReadSchema") && !p.contains("quality,"),
      s"projection should prune the evolved column:\n$p")
  }

  test("write-audit-publish: bad snapshots never become visible") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-wap").toString
    def audit(df: DataFrame): Seq[String] =
      (if (df.filter(col("id").isNull).count() > 0) Seq("null_id") else Nil) ++
        (if (df.count() == 0) Seq("empty") else Nil)
    // v1: clean — publishes
    val r1 = graft.core.Layout.writeAuditPublish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, "1", audit)
    assert(r1.isRight, r1)
    assert(graft.core.Layout.readCurrent(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // v2: planted violation — refused, current still serves v1
    val bad = Seq((Some(3L), "c"), (None, "d"))
      .toDF("id", "v")
    val r2 = graft.core.Layout.writeAuditPublish(bad, root, "2", audit)
    assert(r2 === Left(Seq("null_id")))
    assert(graft.core.Layout.readCurrent(spark, root)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L),
      "a refused snapshot must not replace current")
    // staging must not linger
    assert(!new java.io.File(s"$root/_staging_2").exists)
    // v3: clean again — publishes over v1; v1 dir remains for readers
    val r3 = graft.core.Layout.writeAuditPublish(
      Seq((9L, "z")).toDF("id", "v"), root, "3", audit)
    assert(r3.isRight)
    assert(graft.core.Layout.readCurrent(spark, root)
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
    assert(new java.io.File(s"$root/v_1").exists, "old version stays readable")
  }

  test("write-audit-publish: readCurrent never fails or sees a torn view " +
      "while publishes race past it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-wap-race").toString
    // snapshot k = k rows, every row carrying its version; a torn read
    // would surface as a mixed-version result or a wrong count.
    def snap(k: Int) =
      (1 to k).map(i => (i.toLong, k.toLong)).toDF("id", "snap_version")
    assert(graft.core.Layout
      .writeAuditPublish(snap(1), root, "1", _ => Nil).isRight)
    val publishes = 12
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val rows = graft.core.Layout.readCurrent(spark, root).collect()
          val versions = rows.map(_.getLong(1)).distinct
          if (versions.length != 1)
            failures.add(s"mixed versions: ${versions.mkString(",")}")
          else if (rows.length != versions.head)
            failures.add(s"torn snapshot v=${versions.head}: ${rows.length} rows")
          reads.incrementAndGet()
        } catch {
          case e: Throwable => failures.add(s"readCurrent threw: $e")
        }
      }
    })
    reader.start()
    (2 to publishes).foreach { k =>
      assert(graft.core.Layout
        .writeAuditPublish(snap(k), root, k.toString, _ => Nil).isRight)
    }
    stop.set(true)
    reader.join(30000)
    assert(failures.isEmpty, s"reader observed: ${failures}")
    assert(reads.get() > 0, "reader never completed a read")
    // every pointer is retained (the snapshot log time travel reads
    // through); the newest one is what readCurrent resolves
    val ptrs = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("current-")).toSet
    assert(ptrs === (1 to publishes).map(k => s"current-$k").toSet, ptrs)
  }

  test("time travel: readAt(seq) serves the pinned view after later publishes") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-wap-tt").toString
    def snap(k: Int) =
      (1 to k).map(i => (i.toLong, k.toLong)).toDF("id", "snap_version")
    (1 to 3).foreach { k =>
      assert(graft.core.Layout
        .writeAuditPublish(snap(k), root, k.toString, _ => Nil).isRight)
    }
    // the log lists every publish, ascending, seq -> version dir
    assert(graft.core.Layout.snapshots(spark, root) ===
      Seq((1L, "v_1"), (2L, "v_2"), (3L, "v_3")))
    // seq 1 read AFTER seq 2 and 3 published — the pinned old view
    val at1 = graft.core.Layout.readAt(spark, root, 1L).collect()
    assert(at1.map(_.getLong(1)).toSeq === Seq(1L), "must be snapshot 1")
    assert(graft.core.Layout.readAt(spark, root, 2L).collect().length === 2)
    // current still resolves the newest
    assert(graft.core.Layout.readCurrent(spark, root)
      .collect().map(_.getLong(1)).distinct.toSeq === Seq(3L))
    // a never-published seq fails loudly, naming what IS retained
    val e = intercept[IllegalArgumentException] {
      graft.core.Layout.readAt(spark, root, 99L)
    }
    assert(e.getMessage.contains("retained: 1,2,3"))
  }

  test("time travel: retainSnapshots expires old pointers AND their data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-wap-retain").toString
    def snap(k: Int) =
      (1 to k).map(i => (i.toLong, k.toLong)).toDF("id", "snap_version")
    (1 to 4).foreach { k =>
      assert(graft.core.Layout.writeAuditPublish(
        snap(k), root, k.toString, _ => Nil, retainSnapshots = 2).isRight)
    }
    // only the newest 2 snapshots survive; expired ones lose pointer
    // and version dir both
    assert(graft.core.Layout.snapshots(spark, root) ===
      Seq((3L, "v_3"), (4L, "v_4")))
    assert(!new java.io.File(s"$root/v_1").exists)
    assert(!new java.io.File(s"$root/v_2").exists)
    intercept[IllegalArgumentException] {
      graft.core.Layout.readAt(spark, root, 1L)
    }
    // the time-travel window narrowed; the current view is untouched
    assert(graft.core.Layout.readAt(spark, root, 3L).collect().length === 3)
    assert(graft.core.Layout.readCurrent(spark, root)
      .collect().map(_.getLong(1)).distinct.toSeq === Seq(4L))
  }

  test("time-travel diff query: all four statuses, counts close over the corpus") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val got = graft.llm.Dedup.timeTravelDiff(docs).collect()
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(got.keySet === Set("added", "removed", "changed", "unchanged"))
    // full-outer closure: statuses partition the union of both key sets
    val nOld = docs.filter(col("doc_id") % 10 =!= 0).count()
    val nNew = docs.filter(col("doc_id") % 7 =!= 0).count()
    val nBoth = docs.filter(col("doc_id") % 10 =!= 0)
      .filter(col("doc_id") % 7 =!= 0).count()
    assert(got.values.sum === nOld + nNew - nBoth)
    assert(got("added") === nNew - nBoth)
    assert(got("removed") === nOld - nBoth)
  }

  test("csv malformed rows: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (default): bad row surfaces with nulls + raw line
    val perm = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(dir).cache() // corrupt-record queries need the full row
    assert(perm.count() === 3)
    val bad = perm.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getString(2) === "2,notanumber")
    // DROPMALFORMED: bad row silently gone, good rows intact
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped === Set((1L, 10L), (3L, 30L)))
    // FAILFAST: the load is refused loudly
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("header", "true").option("mode", "FAILFAST")
        .csv(dir).collect()
    }
    assert(ex.getMessage.contains("FAILFAST") ||
      ex.getCause != null, ex.getMessage)
    perm.unpersist()
  }

  test("writeShards: one sorted file per shard, lossless, shard-pure") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = Files.createTempDirectory("graft-shards").toString
    graft.core.Layout.writeShards(docs, out, nShards = 8)
    // every shard directory holds exactly ONE data file (the writer
    // claim: repartition-by-shard prevents the nShards-files-per-task
    // small-file explosion of naive partitionBy)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${dir.getName}: ${files.length} files")
    }
    val back = spark.read.parquet(out)
    // lossless round-trip
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // shard assignment is the documented pure row function
    val h = md5(col("text").cast("binary"))
    val expectShard = pmod(
      ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1)), lit(8))
    assert(back.filter(col("shard") =!= expectShard).count() === 0)
    // within each shard FILE, rows are in sort_key order
    shardDirs.foreach { dir =>
      val keys = spark.read.parquet(dir.getAbsolutePath)
        .select("sort_key").collect().map(_.getString(0))
      assert(keys.sameElements(keys.sorted), s"${dir.getName} unsorted")
    }
  }

  test("z-order octants pin both dimensions (span < 2^13 each, by construction)") {
    val panel = graft.ops.EventOps.zorderPanel(
      Tables.load(spark, sfDir, "events")).collect()
    assert(panel.nonEmpty)
    panel.foreach { r =>
      val (oct, uSpan, hSpan) = (r.getLong(0), r.getLong(4), r.getLong(7))
      assert(uSpan < 8192, s"octant $oct u_span $uSpan escapes its 13-bit cell")
      assert(hSpan < 8192, s"octant $oct h_span $hSpan escapes its 13-bit cell")
    }
  }

  test("z-order layout bounds per-partition spans in BOTH dims; a time sort does not") {
    // The claim OPTIMIZE ZORDER sells: range-partition the write by the
    // Morton key and every file is tight in BOTH dimensions, so footer
    // min/max skipping serves range predicates on either. A time-only
    // sort gives perfect h spans but leaves u at (almost) full domain.
    val keyed = graft.ops.EventOps.zorderKeyed(
      Tables.load(spark, sfDir, "events")).localCheckpoint()
    def spans(df: DataFrame, k: String): (Double, Double) = {
      val per = df.repartitionByRange(16, col(k))
        .select(spark_partition_id().as("p"), col("un"), col("hn"))
        .groupBy("p")
        .agg((max("un") - min("un")).as("us"), (max("hn") - min("hn")).as("hs"))
        .collect()
      (per.map(_.getLong(1)).sum.toDouble / per.length,
        per.map(_.getLong(2)).sum.toDouble / per.length)
    }
    val (zu, zh) = spans(keyed, "z")
    val (tu, _) = spans(keyed, "hn")
    // 16 z-range partitions ≈ 4 z bits ≈ 2 bits per dim: ideal span
    // ~2^14; allow slack for uneven event density
    assert(zu <= 28000, s"z layout: avg u span $zu not bounded")
    assert(zh <= 28000, s"z layout: avg h span $zh not bounded")
    assert(tu >= 45000, s"time-sorted layout unexpectedly bounded u span ($tu)")
  }
}

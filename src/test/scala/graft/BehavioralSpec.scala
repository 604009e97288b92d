package graft

import graft.mr.{KeyValue, MRJob, WordCountApp}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.util.LongAccumulator

/** Behavioral tier (SURVEY §5 port plan tier 4) — the Spark-native
  * equivalents of the reference's mtiming/rtiming/jobcount/crash/
  * early_exit tests:
  *   - parallelism probes -> SparkListener asserting >=2 concurrent
  *     tasks (test-mr.sh:151-208);
  *   - jobcount -> accumulator asserting each partition's work runs
  *     exactly once absent failures (test-mr.sh:211-235);
  *   - crash -> fault injection via TaskContext.attemptNumber, output
  *     must still be exactly-once correct (test-mr.sh:298-346) — the
  *     reference's known at-least-once append bug is exactly what this
  *     asserts we do NOT have;
  *   - early_exit -> committed output is complete and atomic (_SUCCESS
  *     plus no temp dirs, test-mr.sh:238-295).
  */
class BehavioralSpec extends SparkSpec {

  test("map parallelism: >=2 tasks run concurrently (mtiming analog)") {
    val sc = spark.sparkContext
    val running = new AtomicInteger(0)
    val maxConcurrent = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        val c = running.incrementAndGet()
        maxConcurrent.accumulateAndGet(c, math.max)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        running.decrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      // 8 partitions x 200ms sleep: long enough that 4 threads overlap
      sc.parallelize(1 to 8, 8)
        .map { i => Thread.sleep(200); i }
        .count()
      // listener events are delivered async; give the bus a moment
      val deadline = System.nanoTime() + 5e9.toLong
      while (maxConcurrent.get() < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(maxConcurrent.get() >= 2,
        s"expected concurrent tasks, max was ${maxConcurrent.get()}")
    } finally sc.removeSparkListener(listener)
  }

  test("no duplicate task execution absent failures (jobcount analog)") {
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("invocations")
    val n = 16
    val result = spark.sparkContext.parallelize(1 to n, 8)
      .map { i => acc.add(1); i }
      .count()
    assert(result === n.toLong)
    assert(acc.value === n.toLong,
      s"each element must be processed exactly once, got ${acc.value}")
  }

  test("exactly-once correct output under task failure (crash analog)") {
    // First attempt of partition 0 throws; Spark retries the task
    // (master local[4,2] allows 2 attempts). Result must equal the
    // no-failure run exactly — no duplicates, no loss (the reference's
    // O_APPEND shuffle would duplicate here, mr/worker.go:95).
    val sc = spark.sparkContext
    assert(sc.master.matches("local\\[\\d+,\\s*\\d+\\]"),
      s"suite session must allow task retries, got ${sc.master}")
    val data = sc.parallelize(1 to 100, 4)
    val result = data
      .map { i =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected failure (crash.so analog)")
        i.toLong
      }
      .sum()
    assert(result === (1 to 100).sum.toLong.toDouble)
  }

  test("straggler requeue: stalled attempt is killed and retried exactly-once (stall analog)") {
    // The reference coordinator requeues a task whose worker stalls for
    // 10 s (mr/coordinator.go:208-266; the mtiming/rtiming stall half of
    // mrapps/crash.go). Spark's spark.speculation covers this on a real
    // cluster but is hard-disabled in local mode, so the library ships
    // StragglerWatchdog: kill-and-requeue on timeout. Here partition 3's
    // FIRST attempt hangs "forever"; the watchdog must kill it, the
    // scheduler must re-attempt, and the result must be exactly-once.
    val sc = spark.sparkContext
    val wd = new graft.mr.StragglerWatchdog(sc,
      timeoutMs = 1500, checkIntervalMs = 150).start()
    try {
      val result = sc.parallelize(1 to 80, 8)
        .map { i =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
            Thread.sleep(120000) // hung task; the kill interrupt lands here
          i.toLong
        }
        .sum()
      assert(result === (1 to 80).sum.toLong.toDouble,
        "retried partition must contribute exactly once")
      assert(wd.totalKills >= 1,
        "watchdog must have killed the stalled attempt")
    } finally wd.stop()
  }

  test("straggler watchdog: refused kill is retried on the next scan, bounded") {
    // killTaskAttempt can return false (scheduler race, attempt unknown).
    // The watchdog must NOT permanently untrack the attempt on a refusal
    // — it re-tracks and retries next scan — but a refusal loop is
    // bounded by maxKillsPerTask so a long-gone attempt isn't retried
    // forever. Driven synchronously via scanOnce() with a fabricated
    // taskId no scheduler knows (kill always refuses).
    import org.apache.spark.scheduler.{SparkListenerTaskStart, TaskInfo, TaskLocality}
    val sc = spark.sparkContext
    val wd = new graft.mr.StragglerWatchdog(sc,
      timeoutMs = -1, checkIntervalMs = 3600000, maxKillsPerTask = 3)
    // not start()ed: no listener registration, no timer — pure unit drive
    val phantomId = 987654321L
    val info = new TaskInfo(phantomId, 0, 0, 0, System.currentTimeMillis() - 10,
      "driver", "localhost", TaskLocality.PROCESS_LOCAL, false)
    wd.onTaskStart(SparkListenerTaskStart(1, 0, info))
    assert(wd.isTracked(phantomId))
    wd.scanOnce() // kill refused (unknown attempt) -> must stay tracked
    assert(wd.isTracked(phantomId),
      "a refused kill must re-track the attempt for retry on the next scan")
    wd.scanOnce() // second refusal -> still under the bound
    assert(wd.isTracked(phantomId))
    wd.scanOnce() // third refusal hits maxKillsPerTask -> dropped for good
    assert(!wd.isTracked(phantomId),
      "refusal retries must be bounded by maxKillsPerTask")
    assert(wd.totalKills === 0)
  }

  test("straggler watchdog: kill budget is pruned when the stage completes") {
    val sc = spark.sparkContext
    val wd = new graft.mr.StragglerWatchdog(sc, timeoutMs = 1500,
      checkIntervalMs = 150).start()
    try {
      sc.parallelize(1 to 80, 8)
        .map { i =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 2 && tc.attemptNumber() == 0)
            Thread.sleep(120000)
          i.toLong
        }
        .sum()
      // the job's stages have completed; listener events are async, so
      // wait for the stage-completed prune to land
      val deadline = System.currentTimeMillis() + 10000
      while (wd.killBudgetEntries > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(wd.killBudgetEntries === 0,
        "kills map must be pruned per-stage on onStageCompleted")
    } finally wd.stop()
  }

  test("AQE splits a skewed join partition at runtime") {
    // the runtime complement to Skew.saltedSumCount: a hot join key
    // must be split by AQE's skew handling, not melt one reducer
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // key 0 carries 100x the rows of every other key, with an
      // INCOMPRESSIBLE payload (shuffle sizes are of compressed bytes —
      // a constant pad compresses away and defeats skew detection)
      val left = spark.range(60000)
        .select(lit(0).as("k"), sha2(col("id").cast("string"), 256).as("payload"))
        .unionAll(spark.range(600).select(
          (col("id") % 50 + 1).cast("int").as("k"),
          sha2(col("id").cast("string"), 256).as("payload")))
      val right = (0 to 50).toDF("k").withColumn("rv", col("k") * 2)
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's QueryExecution, so its adaptive
      // plan finalizes (count() would plan a separate query)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in final plan:\n$p")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("committed output is atomic and complete (early_exit analog)") {
    val out = Files.createTempDirectory("graft-commit").toString + "/wc"
    val pg = Seq("/root/reference/main/pg-being_ernest.txt",
      "/root/reference/main/pg-metamorphosis.txt")
    val result = MRJob.run(spark, WordCountApp, pg)
    MRJob.writeText(result, out)
    val files = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(files.contains("_SUCCESS"), "commit marker missing")
    assert(!files.exists(_.startsWith("_temporary")),
      "uncommitted attempt dirs must not survive job end")
    // re-read: content equals the in-memory result exactly (stable
    // after commit, second snapshot == first, test-mr.sh:285-294)
    val written = spark.read.text(out).collect().map(_.getString(0)).sorted
    val expected = result.collect()
      .map(kv => s"${kv.key} ${kv.value}").sorted
    assert(written === expected)
  }

  test("observe: inline data-quality counters ride the job for free") {
    // Observation metrics evaluate inside the running job — at 100 TB
    // the alternative is a SECOND full pass just to count violations;
    // observe() folds the audit into whatever job was running anyway
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation("dq")
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
        max("l_extendedprice").as("max_price"))
    // the downstream "real" work — an aggregate that consumes the scan
    val total = li.groupBy("l_returnflag").count().collect()
      .map(_.getLong(1)).sum
    val m = obs.get
    assert(m("rows_seen") === total, "observed rows == rows the job read")
    assert(m("bad_qty") === 0L)
    assert(m("max_price").asInstanceOf[Double] > 0.0)
  }
}

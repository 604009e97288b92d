package graft

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.{BeforeAndAfterAll, Tag}
import org.scalatest.funsuite.AnyFunSuite

/** Marks tests needing a `local-cluster[2,2,1024]` session (real
  * executor PROCESSES, not threads). These self-cancel in the default
  * `sbt test` because the suite owns the JVM's one SparkContext; run
  * it dedicated:
  *
  *   GRAFT_LOCAL_CLUSTER=1 sbt 'testOnly graft.LocalClusterSpec'
  */
object LocalClusterTag extends Tag("graft.LocalClusterTag")

/** The behavioral invariants re-proven across REAL executor
  * boundaries: local[*] threads share one heap, so block transfers,
  * closure/accumulator serialization, executor-local checkpoint state,
  * and task retry all take shortcuts a cluster doesn't get. This suite
  * runs the BehavioralSpec core (parallelism, exactly-once, commit
  * atomicity), a salted-join peak-task assertion, and the reliable
  * barrier (including surviving an executor kill — the exact failure
  * bare localCheckpoint cannot survive) on `local-cluster[2,2,1024]`:
  * 2 separate executor JVMs x 2 cores x 1 GiB.
  *
  * The executor-kill test is LAST: it leaves the app with one
  * executor.
  */
class LocalClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  /** Gate: the suite needs the JVM to itself (one SparkContext). */
  private val enabled = sys.env.get("GRAFT_LOCAL_CLUSTER").contains("1")

  override protected def test(name: String, tags: Tag*)(body: => Any)(
      implicit pos: org.scalactic.source.Position): Unit =
    super.test(name, tags: _*) {
      assume(enabled, "set GRAFT_LOCAL_CLUSTER=1 to run local-cluster tests")
      body
    }

  override def beforeAll(): Unit = if (enabled) {
    // executor JVMs are launched by the in-process Worker via
    // SPARK_HOME's command builder: they get SPARK_HOME/jars plus
    // whatever we pass here — ship the test JVM's full classpath so
    // graft classes (and test fixtures inside closures) resolve
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-local-cluster")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    assert(spark.sparkContext.master.startsWith("local-cluster"),
      s"suite requires a dedicated JVM, got ${spark.sparkContext.master}")
  }

  // ---- gate stamp: counted by the run itself, written only by the run
  private val nPassed = new java.util.concurrent.atomic.AtomicInteger(0)
  private val nFailed = new java.util.concurrent.atomic.AtomicInteger(0)

  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val outcome = super.withFixture(test)
    outcome match {
      case org.scalatest.Succeeded => nPassed.incrementAndGet()
      case _: org.scalatest.Canceled => () // disabled run: no stamp claim
      case _ => nFailed.incrementAndGet()
    }
    outcome
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    // The per-round floor claim "the cluster smoke ran on this commit"
    // must be MACHINE-generated, not hand-written: the dedicated run
    // stamps CLUSTERGATE.json (and appends to PROGRESS.jsonl) itself,
    // with the git rev it executed against. A round that never ran the
    // suite has no stamp for its final commit — the gap is visible.
    // Stamping must never mask a test result (we are in afterAll) and
    // must never write to a stray directory: resolve the repo root via
    // git itself (already shelling out for the rev) and SKIP the stamp
    // when that fails — an IDE run from elsewhere then simply leaves no
    // stamp, which the per-round gap check surfaces, instead of
    // stamping the wrong repo.
    if (enabled && (nPassed.get + nFailed.get) > 0) {
      try {
        val cwd = new java.io.File(sys.props("user.dir"))
        val repo = new java.io.File(scala.sys.process.Process(
          Seq("git", "rev-parse", "--show-toplevel"), cwd).!!.trim)
        val rev = scala.sys.process.Process(
          Seq("git", "rev-parse", "HEAD"), repo).!!.trim
        val dirty =
          try scala.sys.process.Process(
            Seq("git", "status", "--porcelain"), repo).!!.linesIterator
            .exists(l => l.contains("src/main") || l.contains("src/test"))
          catch { case _: Exception => true }
        val stamp =
          s"""{"gate": "local-cluster-smoke", "suite": "graft.LocalClusterSpec",
             | "master": "local-cluster[2,2,1024]",
             | "passed": ${nPassed.get}, "failed": ${nFailed.get},
             | "green": ${nFailed.get == 0 && nPassed.get > 0},
             | "git_rev": "$rev", "src_dirty": $dirty,
             | "date": "${java.time.Instant.now()}"}""".stripMargin
          .replace("\n", "")
        val f = new java.io.File(repo, "CLUSTERGATE.json")
        val w = new java.io.FileWriter(f)
        try w.write(stamp + "\n") finally w.close()
        val p = new java.io.FileWriter(
          new java.io.File(repo, "PROGRESS.jsonl"), true)
        try p.write(stamp + "\n") finally p.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"LocalClusterSpec: gate stamp skipped (${e.getMessage})")
      }
    }
  }

  /** Peak per-task executor run time across one action. */
  private final class TaskPeak extends SparkListener {
    val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val executorIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskMetrics != null)
        maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      if (t.taskInfo != null) executorIds.add(t.taskInfo.executorId)
    }
  }

  private def measured[A](body: => A): (A, TaskPeak) = {
    val l = new TaskPeak
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(2000) // listener bus drains async
      (r, l)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("work spreads across >=2 executor processes", LocalClusterTag) {
    val (sum, l) = measured {
      spark.sparkContext.parallelize(1 to 64, 16)
        .map { i => Thread.sleep(50); i.toLong }.sum()
    }
    assert(sum === (1 to 64).sum.toLong.toDouble)
    val execs = l.executorIds
    execs.remove("driver")
    assert(execs.size >= 2, s"expected >=2 executors, saw $execs")
  }

  test("exactly-once under task failure across process boundaries",
      LocalClusterTag) {
    // attempt 0 of partition 0 dies (the whole executor-side task, not
    // a thread in the driver heap); the retry may land on the OTHER
    // executor — the result must still be exactly-once
    val result = spark.sparkContext.parallelize(1 to 100, 4)
      .map { i =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected failure (crash analog)")
        i.toLong
      }
      .sum()
    assert(result === (1 to 100).sum.toLong.toDouble)
  }

  test("accumulators count each element once absent failures",
      LocalClusterTag) {
    val acc = spark.sparkContext.longAccumulator("invocations")
    val n = 32
    val result = spark.sparkContext.parallelize(1 to n, 8)
      .map { i => acc.add(1); i }.count()
    assert(result === n.toLong)
    assert(acc.value === n.toLong)
  }

  test("committed output is atomic and complete across executors",
      LocalClusterTag) {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-lc-commit").toString + "/agg"
    val df = graft.core.Tables.load(spark, sfDir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    df.write.parquet(out)
    val files = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(files.contains("_SUCCESS"), "commit marker missing")
    assert(!files.exists(_.startsWith("_temporary")),
      "uncommitted attempt dirs must not survive job end")
    val written = spark.read.parquet(out)
      .collect().map(_.mkString("|")).sorted
    assert(written === df.collect().map(_.mkString("|")).sorted)
  }

  test("salted join cuts the hot block's peak task; counts identical",
      LocalClusterTag) {
    val ss = spark
    import ss.implicits._
    // 1500 identical 40-token docs in ONE jaccard block: unsalted, a
    // single task verifies all ~1.1M candidate pairs (each a 40-element
    // intersect — verification dominates the stage); salted, the probe
    // side spreads across ~ceil(1500/128) salt partitions
    val hotText = (0 until 40).map(i => s"tok$i").mkString(" ")
    val hot = (0 until 1500).map(i => (i.toLong, hotText))
    val bg = (0 until 500)
      .map(i => (10000L + i, s"background doc b$i c${i % 7} d${i % 13}"))
    val d = (hot ++ bg).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .repartition(8)
    import graft.core.Barrier.BarrierOps
    val dd = d.barrier()
    val unsalted = graft.llm.Dedup.jaccardPairs(dd, 0.5, saltTarget = -1)
    val salted = graft.llm.Dedup.jaccardPairs(dd, 0.5, saltTarget = 128)
    unsalted.count(); salted.count() // warm codegen/JIT
    val (nU, lU) = measured(unsalted.count())
    val (nS, lS) = measured(salted.count())
    assert(nS === nU, "salting changed the pair count")
    assert(nU > 1000000L, s"fixture should be pair-heavy, got $nU")
    val (pU, pS) = (lU.maxRunMs.get, lS.maxRunMs.get)
    assert(pS < pU * 6 / 10,
      s"salted peak task ${pS}ms not under 0.6x unsalted ${pU}ms")
  }

  test("iterative op over reliable barrier == forced-local run",
      LocalClusterTag) {
    // auto mode resolves to RELIABLE on a local-cluster master
    assert(graft.core.Barrier.useReliable(spark))
    val q = SparkEntry.queries("q_dedup_clusters")
    def checksum(df: org.apache.spark.sql.DataFrame): Long = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
    }
    val reliable = checksum(q(spark, sfDir))
    spark.conf.set("spark.graft.barrier", "local")
    val local =
      try checksum(q(spark, sfDir))
      finally spark.conf.set("spark.graft.barrier", "auto")
    assert(reliable === local)
  }

  test("every-k RoundBarrier chain recomputes across process boundaries",
      LocalClusterTag) {
    // the persisted (non-checkpoint) rounds live as executor blocks in
    // SEPARATE processes here; dropping them forces a recompute that
    // must reach the k-th round's checkpoint FILES, not driver-heap
    // shortcuts
    spark.conf.set("spark.graft.barrier.everyK", "3")
    try {
      // scope the simulated loss to this chain's blocks (shared session)
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val rb = new graft.core.RoundBarrier(spark)
      var df = rb.next(spark.range(0, 10000, 1, 8).toDF("v"))
      for (_ <- 1 to 4) df = rb.next(df.withColumn("v", col("v") + 1))
      val want = (4L until 10004L).sum
      assert(df.agg(sum("v")).head.getLong(0) === want)
      spark.sparkContext.getPersistentRDDs
        .collect { case (id, rdd) if !preexisting(id) => rdd }
        .foreach(_.unpersist(blocking = true))
      assert(df.agg(sum("v")).head.getLong(0) === want,
        "recompute through the k-th checkpoint failed")
      graft.core.Barrier.free(rb.seal(df))
    } finally spark.conf.unset("spark.graft.barrier.everyK")
  }

  test("reliable checkpoint survives an executor kill", LocalClusterTag) {
    val sc = spark.sparkContext
    val df = graft.core.Barrier.checkpoint(
      spark.range(0, 100000, 1, 8).toDF("id"))
    val before = df.agg(sum("id")).head.getLong(0)
    // harvest live executor ids via a listener (the SparkContext
    // accessor is private[spark]); the checkpoint job above plus this
    // probe job touch both executors
    val (_, probe) = measured {
      sc.parallelize(1 to 64, 16).map { i => Thread.sleep(20); i }.count()
    }
    probe.executorIds.remove("driver")
    val execs = probe.executorIds
    assert(execs.size >= 2, s"need 2 executors to kill one, got $execs")
    val nBefore = sc.statusTracker.getExecutorInfos.length
    assert(sc.killExecutors(Seq(execs.iterator().next())),
      "kill not acknowledged")
    // wait until the executor is actually gone
    val deadline = System.nanoTime() + 30e9.toLong
    while (sc.statusTracker.getExecutorInfos.length >= nBefore &&
        System.nanoTime() < deadline) Thread.sleep(200)
    assert(sc.statusTracker.getExecutorInfos.length < nBefore,
      "executor did not die")
    // with localCheckpoint this read would fail (blocks on the dead
    // executor, no lineage); the reliable barrier re-reads files
    val after = df.agg(sum("id")).head.getLong(0)
    assert(after === before)
  }
}

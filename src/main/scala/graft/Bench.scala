package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Emits ONE JSON line with the total and the
  * slowest per-query times, and writes the COMPLETE per-query map
  * (including every raw sample per query) to `bench_full.json`.
  *
  * Reporting contract, learned the hard way across rounds:
  *
  *  - The round driver captures sbt's stdout and JSON-parses lines in
  *    the last ~2000 characters. Under `sbt runMain` the program's
  *    System.out is routed through sbt's logger, which prefixes every
  *    line with "[info] " — and a line that does not START with '{'
  *    never parses (BENCH r1..r6 all have `parsed: null`; r6's line was
  *    intact in the tail and parseable standalone, killing the earlier
  *    line-length theory). So the line is written STRAIGHT TO FD 1
  *    (`FileDescriptor.out`), which no in-process logger can intercept,
  *    preceded by a newline to guarantee it starts at column 0.
  *  - The line is also size-capped (queries packed slowest-first until
  *    a byte budget) so the tail window cannot behead it, and the
  *    failed list is capped the same way — 97 failing names would blow
  *    the budget exactly when the line matters most.
  *  - Numbers are formatted with Locale.ROOT: the default-locale `f`
  *    interpolator emits "86,694" under comma-decimal locales, which is
  *    invalid JSON.
  *  - Env-derived strings (sfDir, outPath) are JSON-escaped.
  *
  * Measurement: each query runs once per PASS and reports the MIN
  * across passes (default 2 passes). One sample made driver numbers
  * hostage to container load spikes (r5 recorded 27.5 s for a query
  * that reproduces at 9.4 s cold / 4.3 s warm; r6 recorded 47 s with
  * no code change in the query path). Min-of-2 discards a one-off
  * spike — but when the two samples ran BACK-TO-BACK per query (r10),
  * a sustained multi-minute load window poisoned both and min kept it
  * (official r10 artifact: 153 s; same code isolated: ~63 s). So the
  * samples are now taken as FULL PASSES over the whole suite: pass 1
  * runs every query once, then pass 2 runs every query once. Same
  * total cost, but a load window lands on *different* queries in each
  * pass and min-of-passes discards it. A final short pass re-measures
  * the top-`SPARK_GRAFT_BENCH_REMEASURE` (default 10) slowest queries
  * once more — the slowest queries dominate the total, so they get a
  * third chance to shed residual load. All raw samples land in
  * bench_full.json (with their pass index, `sample_passes`) so
  * variance stays inspectable.
  *
  * Flagged-pass auto-retry (round 13): self-declaration alone still
  * left the r12 headline needing a judge re-measure (pass 0 flagged
  * 7.7x, value overstated ~1.4-2x). Now, if after the scheduled passes
  * fewer than `runs` passes are calibration-clean, up to
  * `SPARK_GRAFT_BENCH_RETRIES` (default 1) additional full passes run,
  * and the headline statistic is min over samples from CLEAN passes
  * only (falling back to min-of-all for a query measured exclusively
  * under load — still declared via `loaded_passes`). Both the original
  * and retry samples are recorded in bench_full.json.
  *
  * Load self-declaration: BenchVariance adjudicates spread AFTER the
  * fact, but spread cannot distinguish "loaded window" from "real
  * regression" without an isolated re-run. So the bench carries its own
  * load index IN the artifact: a fixed CPU-bound calibration kernel (a
  * range sum — constant work, no IO, no state) runs before each pass,
  * every `CalibEvery` queries within a pass, and around the re-measure
  * pass; every calibration time lands in bench_full.json with its
  * (pass, position). A pass with any calibration sample >2× the run's
  * best calibration is flagged in `loaded_passes` AT ARTIFACT-WRITE
  * TIME — the artifact itself says "this window was loaded", instead of
  * leaving the reader to infer it from spread.
  *
  * TWO kernels (round 14): the CPU kernel is blind to block-storage
  * contention — BENCH_r13's calibration read clean while the
  * localCheckpoint-heavy q_pairs_contrastive ran 2.4x its isolated
  * time. An IO kernel (fixed incompressible parquet scan →
  * DISK_ONLY localCheckpoint write → count read → unpersist) now runs
  * at every calibration point; each kernel is normalized against its
  * OWN run-best and a pass is flagged if EITHER kernel exceeded 2x
  * (loadedPassesAll). Spread-triggered re-measure (round 14): beyond
  * the top-N slowest, any query whose samples spread >3x max/min joins
  * the final re-measure set (remeasureSet) — every one of r13's
  * contrastive samples had measured load, which top-N-only kept.
  * The run also emits BASELINE-snippet.md: the one-row summary
  * BASELINE.md's round header quotes VERBATIM, generated from the same
  * numbers as the artifact so the narrated and official figures cannot
  * drift apart.
  */
object Bench {
  // stdout-line byte budget: 2000-char driver tail minus sbt's
  // "[success] Total time ..." trailer (~80 chars) minus safety margin
  private val LineBudget = 1700

  // calibration cadence: one kernel run every N timed queries
  private val CalibEvery = 40

  private def ms3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => String.format("\\u%04x", Int.box(c.toInt))
      case c => c.toString
    }

  /** Passes flagged loaded: any calibration sample in the pass exceeds
    * 2x the run's best sample (the "idle" reference). Pure — unit
    * tested in BenchLogicSpec; `calib` rows are (pass, position, sec).
    */
  def loadedPasses(calib: Seq[(Int, Int, Double)]): Set[Int] =
    if (calib.isEmpty) Set.empty
    else {
      val base = calib.map(_._3).min
      calib.groupBy(_._1).collect {
        case (p, ss) if ss.exists(_._3 > 2.0 * base) => p
      }.toSet
    }

  /** Headline statistic for one query: min over samples taken in
    * calibration-clean passes; a query whose every sample landed in a
    * flagged window falls back to min-of-all (the artifact still
    * declares the windows via `loaded_passes`). `ss` = (pass, sec).
    */
  def headlineMin(ss: Seq[(Int, Double)], flagged: Set[Int]): Double = {
    val clean = ss.collect { case (p, v) if !flagged(p) => v }
    if (clean.nonEmpty) clean.min else ss.map(_._2).min
  }

  /** Retry policy: run another full pass while fewer than `runs`
    * passes are calibration-clean and the retry budget remains.
    */
  def needRetry(passesRun: Int, runs: Int, flagged: Set[Int],
                retried: Int, maxRetries: Int): Boolean =
    retried < maxRetries &&
      (0 until passesRun).count(p => !flagged(p)) < runs

  /** Headline-confidence self-declaration: a multi-pass run whose
    * retries still left FEWER than two calibration-clean passes has a
    * headline that is a point estimate, not a min — r14's official
    * artifact rested on 1 clean pass of 3 and needed a judge
    * re-measure to adjudicate. Stamped as `single_clean_pass` in the
    * artifact and the stdout line whenever the run was CONFIGURED
    * multi-pass (runs >= 2) yet fewer than 2 passes came out clean.
    * A deliberate single-pass dev run (runs = 1) is not flagged — its
    * weaker statistic is declared by `passes` itself. Pure — unit
    * tested in BenchLogicSpec.
    */
  def singleCleanPass(passesRun: Int, runs: Int, flagged: Set[Int]): Boolean =
    runs >= 2 && (0 until passesRun).count(p => !flagged(p)) < 2

  /** Union of per-kernel flag sets, each kernel normalized against its
    * OWN run-best (the CPU and IO kernels have different idle
    * baselines — comparing an IO sample to the CPU best would flag
    * every pass). A pass is loaded if ANY kernel saw >2x its baseline
    * in it. Pure — unit tested in BenchLogicSpec.
    */
  def loadedPassesAll(kernels: Seq[Seq[(Int, Int, Double)]]): Set[Int] =
    kernels.map(loadedPasses).foldLeft(Set.empty[Int])(_ ++ _)

  /** Re-measure selection after the passes: the `topN` slowest queries
    * (they dominate the total) PLUS any query whose samples spread
    * beyond `spreadFactor` (max/min) — r13's q_pairs_contrastive
    * showed [21.3, 14.9, 17.5]-style spreads that the top-N-only rule
    * kept at face value while every sample had measured load. Returns
    * (slowest, spreadTriggered) disjoint, both in selection order.
    * Pure — unit tested in BenchLogicSpec.
    */
  def remeasureSet(samples: Seq[(String, Seq[Double])], topN: Int,
                   spreadFactor: Double): (Seq[String], Seq[String]) = {
    val nonEmpty = samples.filter(_._2.nonEmpty)
    val slowest = nonEmpty.sortBy(-_._2.min).take(topN.max(0)).map(_._1)
    val taken = slowest.toSet
    val spread = nonEmpty.collect {
      case (k, ss) if !taken(k) && ss.size >= 2 && ss.min > 0 &&
        ss.max / ss.min > spreadFactor => k
    }.sorted
    (slowest, spread)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default mirrors the documented bench environment (local[32],
    // 32 hardware threads); SPARK_GRAFT_CPUS overrides for smaller boxes.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see graft.core.Graft
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // measure operators, not memo hits: some deterministic artifacts
      // (dup-cluster labels) are session-cached for composing queries;
      // a second timed sample must re-pay the real cost
      .config("spark.graft.memoize", "false")
      // A 300+-execution session accumulates broadcast blocks, shuffle
      // files and checkpoint RDDs whose cleanup rides the
      // ContextCleaner — which only acts on driver GC, and an 8 GiB
      // heap can run a whole pass without one (first two-pass run:
      // pass 1 cold 163 s, pass 2 WARM 324 s — the accumulated state,
      // not load, was the slowdown; isolated re-runs of the same
      // queries all landed at expected levels). Force the cleaner's
      // periodic GC down from its 30 min default, and cap the status
      // store so retained per-execution plan graphs stop growing the
      // heap.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      // The generated-code cache defaults to 100 entries — a
      // 155-query suite churns it completely between a query's pass-1
      // and pass-2 samples, so hot kernels (the prefix-rank join
      // family above all) re-generate AND re-JIT on every sample:
      // q_dedup_edit measured 7.5 s inside the full suite vs 3.6 s in
      // a 10-query run of the SAME code. Static conf, so it must be
      // set before the first session in the JVM.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs one-time session/codegen/JIT startup so
    // per-query numbers measure the queries, not the JVM.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => }
    // The prefix-rank threshold join's generated code + kernel JIT is
    // ~6 s of one-time cost (measured: first jaccardPairs 8.8 s vs
    // 2.5 s warm in the same session) that otherwise lands on
    // whichever dedup query runs first alphabetically. Compile it on a
    // 2-doc corpus so per-query numbers measure the operator.
    try {
      import spark.implicits._
      val tiny = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
      graft.llm.Dedup.jaccardPairs(tiny, 0.9).count()
    } catch { case _: Throwable => }
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names, for local
    // iteration on a slow query without paying the full suite. The
    // driver never sets it, so round numbers always cover everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // A typo'd name would otherwise yield an empty selection and a
      // bench that "succeeds" having measured nothing.
      val unknown = names.filterNot(SparkEntry.queries.contains)
      if (unknown.nonEmpty)
        System.err.println(
          s"WARNING: SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    // SPARK_GRAFT_BENCH_CHANGED_SINCE=<git rev>: select only the
    // queries whose providing module file changed since <rev> — for
    // mid-session iteration as the suite grows (261 queries x 2 passes
    // ~8 min cold even in a quiet window). Granularity is the module
    // file: a change to a shared kernel (functions/, core/, streaming/,
    // mr/) conservatively selects EVERYTHING, because any query may
    // compose it. Harness-only files (Bench/Verify/SparkEntry, tools/)
    // select nothing. The driver never sets this, so official round
    // artifacts always cover the full suite; SPARK_GRAFT_BENCH_ONLY
    // takes precedence when both are set.
    val moduleQueryFiles: Map[String, Set[String]] = Map(
      "src/main/scala/graft/ops/Relational.scala" -> graft.ops.Relational.queries.keySet,
      "src/main/scala/graft/ops/EventOps.scala" -> graft.ops.EventOps.queries.keySet,
      "src/main/scala/graft/ops/GraphOps.scala" -> graft.ops.GraphOps.queries.keySet,
      "src/main/scala/graft/ops/EntityOps.scala" -> graft.ops.EntityOps.queries.keySet,
      "src/main/scala/graft/llm/TextOps.scala" -> graft.llm.TextOps.queries.keySet,
      "src/main/scala/graft/llm/Dedup.scala" -> graft.llm.Dedup.queries.keySet,
      "src/main/scala/graft/llm/Similarity.scala" -> graft.llm.Similarity.queries.keySet,
      "src/main/scala/graft/llm/Multimodal.scala" -> graft.llm.Multimodal.queries.keySet,
      "src/main/scala/graft/llm/Pipeline.scala" -> graft.llm.Pipeline.queries.keySet,
      "src/main/scala/graft/llm/Sampling.scala" -> graft.llm.Sampling.queries.keySet,
      "src/main/scala/graft/llm/Curation.scala" -> graft.llm.Curation.queries.keySet,
      "src/main/scala/graft/llm/CorpusOps.scala" -> graft.llm.CorpusOps.queries.keySet,
      "src/main/scala/graft/sql/GraftSql.scala" -> graft.sql.GraftSql.queries.keySet)
    val harnessOnly = Set(
      "src/main/scala/graft/Bench.scala",
      "src/main/scala/graft/Verify.scala",
      "src/main/scala/graft/SparkEntry.scala")
    // Dev convenience, never driver-set — so it must be robust, not
    // fatal: git runs with -C <repo root> (the `-- src/main` pathspec
    // is cwd-relative, so a bench launched from elsewhere would
    // silently select nothing), and any git failure (invalid rev, not
    // a repo) falls back to the FULL suite with a warning instead of
    // aborting the run.
    val changedSel: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_CHANGED_SINCE").flatMap { rev =>
        try {
          val root = scala.sys.process.Process(
            Seq("git", "rev-parse", "--show-toplevel")).!!.trim
          val out = scala.sys.process.Process(
            Seq("git", "-C", root, "diff", "--name-only", rev,
              "--", "src/main")).!!
          val files = out.split('\n').map(_.trim).filter(_.nonEmpty).toSet
          val shared = (files -- moduleQueryFiles.keySet -- harnessOnly)
            .filterNot(_.startsWith("src/main/scala/graft/tools/"))
          if (shared.nonEmpty) {
            System.err.println(
              s"changed-since: shared kernel files changed (${shared.toSeq.sorted.mkString(", ")}) — selecting the FULL suite")
            Some(SparkEntry.queries.keySet)
          } else
            Some(files.flatMap(f =>
              moduleQueryFiles.getOrElse(f, Set.empty[String])))
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"changed-since: git failed (${e.getMessage}) — running the FULL suite")
            None
        }
      }
    val selected = only.orElse(changedSel) match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val order = selected.keys.toSeq.sorted
    val fns = selected
    // samples(name) accumulates (pass, wall time) per pass, in pass
    // order; a query that fails in any pass is marked failed and
    // skipped in later passes (a deterministic failure would just fail
    // slowly again) — flakiness is a failure, not a fast run.
    val samples = scala.collection.mutable.LinkedHashMap(
      order.map(k =>
        k -> scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]): _*)
    val okMap = scala.collection.mutable.Map(order.map(_ -> true): _*)
    // Calibration kernel: fixed, CPU-bound, stateless (a partitioned
    // range sum through codegen — no IO, no shuffle, no cache effects),
    // so its wall time varies ONLY with ambient load. Sized to ~0.3 s
    // on an idle 32-thread box: heavy enough to need the whole CPU,
    // cheap enough to run ~20 times per bench without moving the total.
    val calibRows = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_CALIB_ROWS", "1500000000").toLong
    // (pass, position-within-pass, seconds); position -1 = before the
    // pass's first query, order.size = after its last
    val calibSamples =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    // IO calibration kernel (round 14): the CPU kernel reads clean
    // under block-storage contention — BENCH_r13's calibration was
    // clean while q_pairs_contrastive (whose localCheckpoint makes it
    // the storage canary) ran 2.4x its isolated time. This kernel
    // times the exact cycle that stalls: scan a fixed parquet fixture,
    // localCheckpoint it to DISK (block write), count (block read),
    // unpersist (delete). Fixture is hash columns (incompressible,
    // ~64 MB at the default 1M rows) written once, untimed, to a temp
    // dir reclaimed at exit. Same >2x-of-run-best flag rule, same
    // loaded_passes/auto-retry machinery, normalized against its OWN
    // baseline (loadedPassesAll).
    val ioCalibSamples =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val ioCalibRows = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_IOCAL_ROWS", "1000000").toLong
    // root kept separately from the live fixture pointer so the
    // end-of-run cleanup still fires if a mid-run cycle failure clears
    // ioCalibDir
    var ioCalibRoot: Option[String] = None
    var ioCalibDir: Option[String] = try {
      val d = java.nio.file.Files.createTempDirectory("graft-bench-iocal")
      ioCalibRoot = Some(d.toString)
      val p = d.resolve("fixture").toString
      try {
        spark.range(0L, ioCalibRows, 1L, cpus.toInt)
          .selectExpr("id", "xxhash64(id) AS h1", "xxhash64(id, 1) AS h2",
            "xxhash64(id, 2) AS h3", "xxhash64(id, 3) AS h4",
            "xxhash64(id, 4) AS h5", "xxhash64(id, 5) AS h6",
            "xxhash64(id, 6) AS h7")
          .write.mode("overwrite").parquet(p)
        Some(p)
      } catch {
        case _: Throwable => // disk-full / permission flake mid-write:
          // don't leak the dir (possibly holding a partial fixture)
          try {
            org.apache.hadoop.fs.FileSystem.get(
              new java.net.URI(d.toString),
              spark.sparkContext.hadoopConfiguration)
              .delete(new org.apache.hadoop.fs.Path(d.toString), true)
          } catch { case _: Throwable => () }
          None
      }
    } catch { case _: Throwable => None } // read-only tmp: CPU-only calib
    def ioCycle(): Unit = ioCalibDir.foreach { p =>
      // Never fatal: the fixture is read at every calibration point of
      // a multi-minute run — a tmp-cleaner race or transient FS error
      // must degrade to CPU-only calibration (loadedPasses tolerates a
      // short/empty IO series), not abort the whole bench.
      try {
        val cp = spark.read.parquet(p).localCheckpoint(eager = true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
        cp.count()
        cp.unpersist(blocking = true)
      } catch {
        case _: Throwable =>
          System.err.println(
            "io-calibration: fixture cycle failed — continuing CPU-only")
          ioCalibDir = None
      }
    }
    def calibrate(pass: Int, at: Int): Unit = {
      val t0 = System.nanoTime()
      // max over per-row xxhash64: forces one hash per row (pure CPU,
      // no overflow under ANSI, not constant-foldable)
      spark.range(0L, calibRows, 1L, cpus.toInt)
        .selectExpr("max(xxhash64(id))").collect()
      calibSamples += ((pass, at, (System.nanoTime() - t0) / 1e9))
      if (ioCalibDir.nonEmpty) {
        val t1 = System.nanoTime()
        ioCycle()
        // a failed cycle records no sample (ioCalibDir cleared inside)
        if (ioCalibDir.nonEmpty)
          ioCalibSamples += ((pass, at, (System.nanoTime() - t1) / 1e9))
      }
    }
    def timeOne(name: String, pass: Int): Unit = {
      val t0 = System.nanoTime()
      val ok = try { fns(name)(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      samples(name) += ((pass, (System.nanoTime() - t0) / 1e9))
      if (!ok) okMap(name) = false
    }
    def runPass(pass: Int): Unit = {
      calibrate(pass, -1)
      var i = 0
      order.foreach { name =>
        if (okMap(name)) {
          timeOne(name, pass)
          i += 1
          if (i % CalibEvery == 0) calibrate(pass, i)
        }
      }
      calibrate(pass, order.size)
      // Untimed inter-pass drain: a driver GC triggers the
      // ContextCleaner's reference queue, releasing the previous
      // pass's broadcast/shuffle/checkpoint blocks so the next pass
      // measures queries, not accumulated state.
      System.gc()
      Thread.sleep(2000)
    }
    def flaggedSet(): Set[Int] =
      loadedPassesAll(Seq(calibSamples.toSeq, ioCalibSamples.toSeq))
    // Full passes: every query once per pass, alphabetical within a
    // pass, so a sustained load window hits DIFFERENT queries in each
    // pass and min-of-passes discards it.
    // untimed calibration warm-up: the kernels' own codegen/JIT (and
    // the IO fixture's first page-cache read) otherwise inflate the
    // first sample (~0.57 vs 0.25 s steady) and falsely flag pass 0
    // as loaded
    try {
      spark.range(0L, calibRows, 1L, cpus.toInt)
        .selectExpr("max(xxhash64(id))").collect()
      // two IO cycles: the first still pays page-cache population and
      // the block-manager write path's JIT (measured 0.74 -> 0.49 ->
      // 0.41 s settling on an idle box — one warm-up leaves the first
      // timed sample at 1.8x baseline, a false-flag near-miss)
      ioCycle(); ioCycle()
    } catch { case _: Throwable => }
    var pass = 0
    while (pass < runs) { runPass(pass); pass += 1 }
    // Auto-retry flagged passes (bounded): a calibration-flagged pass
    // measured ambient load, not queries, so its samples should not be
    // the only ones a query has. Re-run full passes until `runs` passes
    // are calibration-clean or the retry budget is exhausted — r12's
    // official artifact self-declared pass 0 loaded at 7.7x baseline
    // and still needed a judge re-measure to adjudicate; with retries
    // the artifact's headline comes from clean windows by construction.
    // Budget default 3 (was 1): r14's budget-1 run exhausted its one
    // retry with passes 0+1 loaded and shipped a single-clean-pass
    // headline; three extras make >=2 clean passes achievable through
    // a loaded stretch while still bounding a hopelessly noisy box.
    val maxRetries =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt.max(0)
    var retried = 0
    while (needRetry(pass, runs, flaggedSet(), retried, maxRetries)) {
      runPass(pass); pass += 1; retried += 1
    }
    // Isolated re-measure: the slowest queries (they dominate the
    // total) PLUS any query whose samples spread >3x max/min — high
    // spread means at least one sample measured load, and min-of-2
    // keeps whatever the quieter loaded window gave it (r13's
    // q_pairs_contrastive: [21.3, 14.9, 17.5] all loaded, headline
    // 14.9 vs 6.2 isolated). Selection is the pure remeasureSet.
    val remeasure = sys.env.getOrElse("SPARK_GRAFT_BENCH_REMEASURE", "10").toInt.max(0)
    val spreadFactor = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_SPREAD", "3.0").toDouble
    var slowestSel: Seq[String] = Nil
    var spreadSel: Seq[String] = Nil
    if (remeasure > 0 && runs > 1) {
      calibrate(pass, -1)
      val (slowest, spreadTrig) = remeasureSet(
        order.filter(okMap).map(k => k -> samples(k).map(_._2).toSeq),
        remeasure, spreadFactor)
      slowestSel = slowest; spreadSel = spreadTrig
      (slowest ++ spreadTrig).foreach { name =>
        if (okMap(name)) timeOne(name, pass)
      }
      calibrate(pass, slowest.size + spreadTrig.size)
    }
    val flagged = flaggedSet()
    val results = order.map(k => (k, samples(k).toSeq, okMap(k)))
    // A failed query reports its elapsed time NEGATED (and lands in
    // "failed") so a fast failure can't masquerade as a fast query.
    val failedNames = results.collect { case (k, _, false) => k }
    val failedFull = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val chosen = results.map { case (k, ss, ok) =>
      (k, headlineMin(ss, flagged), ok)
    }
    val total = chosen.collect { case (_, v, true) => v }.sum
    // First-sample sum: the cost a FRESH cluster pays (codegen compile,
    // AQE first plan, page-cache misses). min-of-clean is the
    // regression-tracking statistic; cold_total keeps the first-run
    // story honest (r7 spread: q_dedup_edit 17.5 s cold vs 2.25 s warm).
    val coldTotal = results.collect { case (_, ss, true) => ss.head._2 }.sum

    // Complete map, full precision, alphabetical, plus every raw
    // sample — written to a file the driver commits with the round, so
    // nothing is lost to the tail cap and variance stays inspectable.
    val fullQs = chosen.map { case (k, v, ok) =>
      "\"" + k + "\":" + ms3(if (ok) v else -v)
    }.mkString("{", ",", "}")
    val fullSamples = results.map { case (k, ss, _) =>
      "\"" + k + "\":" + ss.map(s => ms3(s._2)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Parallel to `samples`: the pass index each sample was taken in,
    // so a reader can drop flagged-pass samples exactly as the headline
    // statistic did (BenchVariance stays compatible with the flat
    // samples arrays).
    val fullSamplePasses = results.map { case (k, ss, _) =>
      "\"" + k + "\":" + ss.map(_._1.toString).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    // Load index: best calibration over the whole run is the "idle"
    // reference; a pass containing any sample >2x it ran loaded.
    val calibBase =
      if (calibSamples.isEmpty) 0.0 else calibSamples.map(_._3).min
    val calibMax =
      if (calibSamples.isEmpty) 0.0 else calibSamples.map(_._3).max
    val loadedSorted = flagged.toSeq.sorted
    val calibJson = calibSamples
      .map { case (p, at, s) => s"""[$p,$at,${ms3(s)}]""" }
      .mkString("[", ",", "]")
    val ioBase =
      if (ioCalibSamples.isEmpty) 0.0 else ioCalibSamples.map(_._3).min
    val ioMax =
      if (ioCalibSamples.isEmpty) 0.0 else ioCalibSamples.map(_._3).max
    val ioCalibJson = ioCalibSamples
      .map { case (p, at, s) => s"""[$p,$at,${ms3(s)}]""" }
      .mkString("[", ",", "]")
    val loadedJson = loadedSorted.mkString("[", ",", "]")
    val singleClean = singleCleanPass(pass, runs, flagged)
    val remeasureJson =
      s"""{"slowest":${slowestSel.map("\"" + _ + "\"").mkString("[", ",", "]")},"spread_triggered":${spreadSel.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val fullJson =
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","stat":"min_of_clean_passes","passes":$pass,"retried_passes":$retried,"single_clean_pass":$singleClean,"cold_total":${ms3(coldTotal)},"queries":$fullQs,"samples":$fullSamples,"sample_passes":$fullSamplePasses,"failed":$failedFull,"remeasured":$remeasureJson,"calibration":{"unit":"sec","baseline":${ms3(calibBase)},"max":${ms3(calibMax)},"io_baseline":${ms3(ioBase)},"io_max":${ms3(ioMax)},"loaded_passes":$loadedJson,"samples_pass_at_sec":$calibJson,"io_samples_pass_at_sec":$ioCalibJson},"sf":"${jsonEscape(sfDir)}","cpus":$cpus}"""
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => () } // read-only cwd: stdout line still stands
    // Cross-run history: a calibration-clean run can still sit 20-25%
    // above another calibration-clean run (r14: 167.2 vs 207.3 s, all
    // per-query deltas uniform) because a within-run kernel
    // self-normalizes to the run's own best — uniform ambient load is
    // invisible to it. The honest cross-run statistic is min over
    // runs, so every run APPENDS its headline map to
    // bench_history.jsonl (full suite only — partial selections would
    // poison per-query minima) and `BenchVariance <full> history`
    // reads the accumulated file back.
    if (only.isEmpty && changedSel.isEmpty) try {
      val histLine =
        s"""{"total":${ms3(total)},"nq":${results.size},"passes":$pass,"retried":$retried,"single_clean_pass":$singleClean,"loaded_passes":$loadedJson,"calib_base":${ms3(calibBase)},"io_base":${ms3(ioBase)},"sf":"${jsonEscape(sfDir)}","queries":$fullQs}"""
      val w = new java.io.FileWriter("bench_history.jsonl", true)
      try w.write(histLine + "\n") finally w.close()
    } catch { case _: Throwable => () }
    // BASELINE-snippet.md: the exact row BASELINE.md's round header
    // should quote, generated from the SAME numbers as the artifact —
    // the builder pastes it verbatim instead of narrating a different
    // (dev-run) number, the r11/r12/r13 drift class. FULL-SUITE runs
    // only, same gate as the history append: a --only / changed-since
    // selection would otherwise overwrite the quoted row with a
    // partial total (r14 advice).
    if (only.isEmpty && changedSel.isEmpty) try {
      val snippet =
        s"""| Round bench (paste into BASELINE.md) | **${ms3(total)} s warm / ${ms3(coldTotal)} s cold over ${results.count(_._3)} queries, min over clean passes** (passes $pass, retried $retried, failed ${failedNames.size}${if (singleClean) ", SINGLE CLEAN PASS" else ""}; CPU calib ${ms3(calibBase)}-${ms3(calibMax)} s, IO calib ${ms3(ioBase)}-${ms3(ioMax)} s, loaded passes ${if (loadedSorted.isEmpty) "none" else loadedSorted.mkString("/")}; re-measured top ${slowestSel.size} + ${spreadSel.size} spread-triggered; sf `${sfDir}`) |"""
      val w = new java.io.PrintWriter("BASELINE-snippet.md", "UTF-8")
      try w.println(snippet) finally w.close()
    } catch { case _: Throwable => () }
    ioCalibRoot.foreach { d =>
      try {
        org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(d), true)
      } catch { case _: Throwable => () }
    }

    // stdout line: slowest-first entries (failed negated) packed until
    // the byte budget; fast queries are the omitted ones. The failed
    // list is capped to its first 5 names + a count for the same
    // reason.
    val failedCapped = failedNames.take(5).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val byCost = chosen.sortBy { case (_, v, _) => -v }
    val calibTail = ",\"calib_base\":" + ms3(calibBase) +
      ",\"calib_max\":" + ms3(calibMax) +
      ",\"io_calib_base\":" + ms3(ioBase) +
      ",\"io_calib_max\":" + ms3(ioMax) +
      ",\"loaded_passes\":" + loadedJson +
      ",\"passes\":" + pass + ",\"retried_passes\":" + retried +
      ",\"single_clean_pass\":" + singleClean
    val tailFixed = "},\"failed\":" + failedCapped +
      ",\"failed_n\":" + failedNames.size + calibTail +
      ",\"sf\":\"" + jsonEscape(sfDir) + "\"" +
      ",\"nq\":" + results.size +
      ",\"full\":\"" + jsonEscape(outPath) + "\"}"
    val head = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","stat":"min_of_clean_passes","cold_total":${ms3(coldTotal)},"queries":{"""
    val sb = new StringBuilder(head)
    var first = true
    var omitted = 0
    byCost.foreach { case (k, v, ok) =>
      val entry = (if (first) "" else ",") +
        "\"" + k + "\":" + (if (ok) ms3(v) else "-" + ms3(v))
      // reserve room for the fixed tail plus the worst-case omitted count
      if (sb.length + entry.length + tailFixed.length + 20 <= LineBudget) {
        sb.append(entry); first = false
      } else omitted += 1
    }
    sb.append("},\"failed\":").append(failedCapped)
      .append(",\"failed_n\":").append(failedNames.size)
      .append(calibTail)
      .append(",\"sf\":\"").append(jsonEscape(sfDir)).append('"')
      .append(",\"nq\":").append(results.size)
      .append(",\"omitted\":").append(omitted)
      .append(",\"full\":\"").append(jsonEscape(outPath)).append('"').append('}')
    // Straight to fd 1: under `sbt runMain`, System.out is captured by
    // sbt's logger and re-emitted with an "[info] " prefix, which makes
    // the line unparseable by a consumer doing json.loads(line). No
    // in-process redirection can intercept the raw file descriptor.
    val fd1 = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    fd1.println()            // guarantee column 0
    fd1.println(sb.toString)
    fd1.flush()
    spark.stop()
  }
}

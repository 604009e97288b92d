package graft.tools

import graft.core.Barrier.BarrierOps
import graft.core.{Layout, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: run representative operators at 1x and 10x sf0.1 (the
  * 10x input is the same parquet unioned ten times with shifted keys,
  * so the engine re-reads and re-processes 10x the bytes) and report
  * the wall-time ratio. Linear operators should land near 10x or
  * below (below = fixed costs amortizing; well above = a scaling
  * bottleneck). Results feed BASELINE.md's scale-evidence table.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [salt]
  *
  * With `salt`: instead of the operator sweep, probe the prefix-rank
  * threshold join's hot-key salting on a 10x-unioned documents corpus
  * (the corpus' degenerate ~31-token vocabulary makes every prefix
  * rank hot, and the union multiplies each rank's membership 10x — the
  * worst-case output-skew shape). Reports wall time, emitted pairs,
  * pair throughput, and PEAK SINGLE-TASK runtime (the straggler the
  * salting exists to break up) with salting off vs on. Run with sf0.01
  * (10x-unioned = sf0.1-sized input, quadratic-output corpus).
  */
object ScaleProbe {

  /** Sums shuffle-write bytes across all tasks while registered —
    * locally shuffle is a memcpy, but on a real cluster it's the
    * network, so bytes are the transferable scale number.
    */
  private final class ShuffleSum extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.getAndAdd(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def rep(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
      (0 until n).map { i =>
        keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * 100000000L)))
      }.reduce(_ unionAll _)

    if (args.contains("salt")) {
      val docs10 = rep(Tables.load(spark, dir, "documents"), Seq("doc_id"), 10)
        .barrier() // probe the JOIN, not the union re-scan
      // peak single-task runtime across the query — output skew shows
      // up as one task grinding through a hot rank's n^2 pairs
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      Seq("unsalted" -> -1, "salt512" -> 512).foreach { case (label, st) =>
        val pairs = graft.llm.Dedup.jaccardPairs(docs10, 0.5, saltTarget = st)
        pairs.count() // warm codegen/JIT so the timed run measures the join
        val l = new TaskPeak
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val n = pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // listener bus drains async
        spark.sparkContext.removeSparkListener(l)
        println(f"[salt-probe] $label%-9s $n%11d pairs  $dt%7.2f s  " +
          f"${n / dt / 1e6}%6.2f M pairs/s  peak task ${l.maxRunMs.get / 1e3}%6.2f s")
      }
      spark.stop()
      return
    }

    if (args.contains("hamming")) {
      // Banded-hamming skew probe: a duplicate-heavy corpus (viral
      // image re-posted n times) puts n identical hashes in one
      // (band, key) bucket -> n^2/2 pairs from ONE task. Plant two
      // such clusters that GROW with the corpus (the realistic viral
      // regime: 1x -> 4x corpus means 4x cluster membership, 16x its
      // pair count) over a unique-hash background, and measure wall +
      // peak single task with the adaptive salting off vs on. Also
      // asserts the salted result is pair-for-pair identical.
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      Seq("1x (1M hashes, 2x1500-dup)" -> ((1000000L, 1500L)),
        "4x (4M hashes, 2x6000-dup)" -> ((4000000L, 6000L)))
        .foreach { case (label, (n, c)) =>
          val hashes = spark.range(n).select(
            col("id").as("doc_id"),
            when(col("id") < c, lit(0x1234567890abcdefL))
              .when(col("id") < 2 * c, lit(0x0fedcba987654321L))
              .otherwise(xxhash64(col("id"))).as("phash"))
            .barrier() // probe the join, not the generation
          // identity across salt settings is asserted on (count, an
          // order-independent pair checksum) — a count alone would
          // pass a salting bug that swaps WHICH pairs are emitted
          var sums = Map.empty[String, (Long, Long)]
          Seq("unsalted" -> -1, "salt1024" -> 1024, "salt256" -> 256)
            .foreach {
            case (sl, st) =>
              def pairs = graft.llm.Multimodal
                .bandedHammingPairs(hashes, maxHamming = 3, nBands = 4,
                  saltTarget = st)
              pairs.count() // warm codegen/JIT
              val l = new TaskPeak
              spark.sparkContext.addSparkListener(l)
              val t0 = System.nanoTime()
              val rows = pairs.count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(2000) // listener bus drains async
              spark.sparkContext.removeSparkListener(l)
              // bit_xor, not sum: ANSI sum of millions of full-range
              // hashes overflows; xor is order-independent and safe
              // (the pair set is distinct, so xor can't cancel dups)
              val ck = pairs
                .agg(bit_xor(xxhash64(col("doc_a"), col("doc_b"))).as("ck"))
                .head().getLong(0)
              sums += sl -> ((rows, ck))
              println(f"[hamming-probe] $label%-28s $sl%-9s $rows%10d pairs" +
                f"  $dt%7.2f s  peak task ${l.maxRunMs.get / 1e3}%6.2f s")
          }
          require(sums.values.toSet.size == 1,
            s"salting changed the result: $sums")
        }
      spark.stop()
      return
    }

    if (args.contains("winnow")) {
      // winnowPairs skew probe (round 11): a genuinely-duplicated
      // SECTION is this operator's target, and every doc carrying it
      // selects the section's fingerprint hashes -> all those docs
      // land in one (hash) bucket and the unsalted join grinds the
      // bucket's n^2/2 pairs in ONE task. Plant a 60-token shared
      // section into 1-in-50 docs of a unique-filler corpus (the
      // sharing set GROWS with the corpus: 4x docs = 4x members =
      // 16x the bucket's pair count), measure wall + peak task with
      // salting off/on, and assert the pair set is identical.
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      val shared = (1 to 60).map(i => s"shared$i").mkString(" ")
      def corpus(nDocs: Long) = {
        def filler(lo: Long, hi: Long) = array_join(
          transform(sequence(lit(lo), lit(hi)),
            i => concat(lit("u"), (col("id") * 1000L + i).cast("string"))),
          " ")
        spark.range(nDocs).select(
          col("id").as("doc_id"),
          when(pmod(col("id"), lit(50)) === 0,
            concat_ws(" ", filler(1, 30), lit(shared), filler(31, 60)))
            .otherwise(concat_ws(" ", filler(1, 60))).as("text"))
          .barrier() // probe the join, not the generation
      }
      // 16x included because winnow's hot work spreads over the
      // section's ~15 shared hashes (unlike hamming's 4 band buckets),
      // so per-bucket n^2 needs two octaves to outgrow that natural
      // parallelism and dominate the job
      Seq("1x (30k docs, 600 sharing)" -> 30000L,
        "4x (120k docs, 2400 sharing)" -> 120000L,
        "16x (480k docs, 9600 sharing)" -> 480000L).foreach {
        case (label, n) =>
          val docs = corpus(n)
          var sums = Map.empty[String, (Long, Long)]
          Seq("unsalted" -> -1, "salt1024" -> 1024, "salt256" -> 256)
            .foreach { case (sl, st) =>
              def pairs = graft.llm.TextOps
                .winnowPairs(docs, saltTarget = st)
              pairs.count() // warm codegen/JIT
              val l = new TaskPeak
              spark.sparkContext.addSparkListener(l)
              val t0 = System.nanoTime()
              val rows = pairs.count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(2000) // listener bus drains async
              spark.sparkContext.removeSparkListener(l)
              val ck = pairs
                .agg(bit_xor(xxhash64(col("doc_a"), col("doc_b"))).as("ck"))
                .head().getLong(0)
              sums += sl -> ((rows, ck))
              println(f"[winnow-probe] $label%-28s $sl%-9s $rows%10d pairs" +
                f"  $dt%7.2f s  peak task ${l.maxRunMs.get / 1e3}%6.2f s")
            }
          require(sums.values.toSet.size == 1,
            s"salting changed the result: $sums")
      }
      spark.stop()
      return
    }

    if (args.contains("containment")) {
      // containmentPairs skew probe: the hot spot is a hot POSTING —
      // a boilerplate section carried by 1-in-50 docs puts its ~10
      // shingles' posting lists at carrier count, and short quote docs
      // that are slices OF that section probe those exact postings (a
      // 4-shingle doc's rare-first containment prefix is 1 rank — a
      // hot one). Unsalted, ONE task grinds probes x posting; the
      // salting (roles swapped vs prefixRankJoin: the fat INDEX side
      // hash-splits, the small probe side replicates) spreads it.
      // Output grows ~linearly with carriers by the operator's honest
      // semantics (a quote IS contained in every carrier), so expect
      // ~linear wall at 4x; the transferable number is peak task.
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      val section = (1 to 12).map(i => s"shared$i").mkString(" ")
      // 500 fixed quote docs, each a 6-token window of the section
      // (7 distinct windows cycled; text repeats are fine — distinct
      // doc_ids are distinct quote instances, the CMS-page shape)
      def quotes = spark.range(500L).select(
        (col("id") + 5000000L).as("doc_id"),
        concat_ws(" ", (0 until 6).map(j =>
          concat(lit("shared"), pmod(col("id"), lit(7L)) + lit(j + 1))): _*)
          .as("text"))
      def corpus(nDocs: Long) = {
        def filler(lo: Long, hi: Long) = array_join(
          transform(sequence(lit(lo), lit(hi)),
            i => concat(lit("u"), (col("id") * 1000L + i).cast("string"))),
          " ")
        spark.range(nDocs).select(
          col("id").as("doc_id"),
          when(pmod(col("id"), lit(50)) === 0,
            concat_ws(" ", filler(1, 14), lit(section), filler(15, 28)))
            .otherwise(concat_ws(" ", filler(1, 40))).as("text"))
          .unionByName(quotes)
          .barrier() // probe the join, not the generation
      }
      Seq("1x (30k docs, 600 carriers)" -> 30000L,
        "4x (120k docs, 2400 carriers)" -> 120000L).foreach {
        case (label, n) =>
          val docs = corpus(n)
          var sums = Map.empty[String, (Long, Long)]
          Seq("unsalted" -> Int.MaxValue, "salt1024" -> 1024, "salt64" -> 64)
            .foreach { case (sl, st) =>
              def pairs = graft.llm.Dedup.containmentPairs(docs, saltTarget = st)
              pairs.count() // warm codegen/JIT
              val l = new TaskPeak
              spark.sparkContext.addSparkListener(l)
              val t0 = System.nanoTime()
              val rows = pairs.count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(2000) // listener bus drains async
              spark.sparkContext.removeSparkListener(l)
              val ck = pairs
                .agg(bit_xor(xxhash64(col("doc_small"), col("doc_big"))).as("ck"))
                .head().getLong(0)
              sums += sl -> ((rows, ck))
              println(f"[containment-probe] $label%-30s $sl%-9s $rows%9d pairs" +
                f"  $dt%7.2f s  peak task ${l.maxRunMs.get / 1e3}%6.2f s")
            }
          require(sums.values.toSet.size == 1,
            s"salting changed the result: $sums")
      }
      spark.stop()
      return
    }

    if (args.contains("ann")) {
      // int8-ANN candidate-join probe: same bucket structure both
      // sides (nPlanes=14 -> 16k buckets, 2 tables, hamming-1
      // multiprobe); thresholds set high so the output stays
      // answer-sized and the measurement is the join itself. This
      // probe caught two round-8 bugs: (1) the LCG plane signs were
      // correlated (mean |plane-pair dot| 30/64 vs 6 for iid) ->
      // ~2.5k effective buckets of 16k -> superlinear candidate
      // blowup, 142 s at 400k vecs; splitmix64 planes cut it to 10 s.
      // (2) the float path's built side is size-UNDERestimated by
      // Catalyst (array counted as 1 element) -> it broadcast the
      // whole corpus; now pinned to SHUFFLE_HASH. Packed int8 rows
      // are ~56 B compressed on the probe shuffle (vs ~300 B for
      // carried float arrays), which is what a 1000-executor network
      // moves per candidate row.
      Seq("1x (100k vecs)" -> 100000L, "4x (400k vecs)" -> 400000L)
        .foreach { case (label, n) =>
          val vecs = spark.range(n).select(
            col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              ((pmod(hash(col("id"), i), lit(2001)) - lit(1000)) / lit(1000.0))
                .cast("float")).as("embedding"))
            .barrier() // probe the join, not the generation
          Seq(
            "float32" -> (() => graft.llm.Dedup.embeddingPairs(
              vecs, threshold = 0.9, nPlanes = 14, nTables = 2)),
            "int8" -> (() => graft.llm.Dedup.embeddingPairsInt8(
              vecs, threshold = 14500L, nPlanes = 14, nTables = 2)))
            .foreach { case (pl, mk) =>
              mk().count() // warm codegen/JIT
              val l = new ShuffleSum
              spark.sparkContext.addSparkListener(l)
              val t0 = System.nanoTime()
              val rows = mk().count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(2000) // listener bus drains async
              spark.sparkContext.removeSparkListener(l)
              println(f"[ann-probe] $label%-16s $pl%-8s $rows%8d pairs" +
                f"  $dt%7.2f s  shuffle ${l.bytes.get / 1e6}%8.1f MB")
            }
        }
      spark.stop()
      return
    }

    if (args.contains("serve")) {
      // Batch-serving probe (ivfIndexInt8 + ivfSearchInt8Indexed): a
      // FIXED 2k-query batch against a 1x/4x corpus, index build timed
      // separately from the per-batch search — the deployment split
      // (the index is built once per corpus snapshot; batches reuse
      // it). Claims under test: (1) per-batch cost tracks per-cell
      // OCCUPANCY, not corpus size — 4x corpus at 4x cells must cost
      // what 1x cost; (2) index build is the linear amortized cost,
      // itself linear in nCells too (flat assignment scans every
      // centroid — the measured argument for a hierarchical coarse
      // quantizer once nCells reaches ~10^5). Codebooks trained on the
      // 1x corpus (index params are fixed at build time). This probe
      // only runs at all because assignment is the IvfProbesInt8
      // kernel: the old per-cell expression tree fell out of codegen
      // at 256 cells and effectively hung here.
      val queries = spark.range(2000L).select(
        (col("id") * 7919L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(hash(col("id") * 7919L, i), lit(2001)) - lit(1000))
            / lit(1000.0)).cast("float")).as("embedding"))
        .barrier()
      def corpus(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(hash(col("id"), i), lit(2001)) - lit(1000)) / lit(1000.0))
            .cast("float")).as("embedding"))
        .barrier()
      val c1 = corpus(250000L)
      val c4 = corpus(1000000L)
      // the deployment response to a bigger corpus is MORE cells (keep
      // per-cell occupancy ~constant) — feasible only because cell
      // assignment is a kernel, not an O(nCells) expression tree
      val book256 = graft.llm.Similarity.ivfCentroidsInt8(c1, 256)
      val book1024 = graft.llm.Similarity.ivfCentroidsInt8(c1, 1024)
      Seq(("1x corpus, 256 cells", c1, book256),
          ("4x corpus, 256 cells", c4, book256),
          ("4x corpus, 1024 cells", c4, book1024))
        .foreach { case (label, c, book) =>
          val t0 = System.nanoTime()
          val index = graft.llm.Similarity.ivfIndexInt8(c, book)
            .barrier() // the build-once artifact
          val build = (System.nanoTime() - t0) / 1e9
          val mk = () => graft.llm.Similarity.ivfSearchInt8Indexed(
            index, queries, book, k = 10, nProbe = 4)
          mk().count() // warm
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t1 = System.nanoTime()
          val rows = mk().count()
          val dt = (System.nanoTime() - t1) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[serve-probe] $label%-22s build $build%6.2f s |" +
            f" batch $rows%6d results  $dt%6.2f s" +
            f"  shuffle ${l.bytes.get / 1e6}%7.1f MB")
        }
      spark.stop()
      return
    }

    if (args.contains("trainbound")) {
      // Bounded-training-sample probe: codebook training was the one
      // corpus-linear stage left in the ANN family (sf1 rehearsal: ivf
      // 5.96x at 10x data). boundedTrainMod caps the expected training
      // slice at ~trainTarget(k) vectors; this leg measures IVF +
      // residual-PQ training at 250k/1M synthetic vectors, fixed mod 4
      // (the old spelling) vs auto (bounded), and asserts the books
      // are sane (k centroids, int8-range) — NOT identical: a smaller
      // sample legitimately trains different centroids; the driver
      // queries' oracles replay whatever modulus the formula picks, so
      // correctness is engine-vs-oracle, not sample-vs-population.
      def corpus(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(hash(col("id"), i), lit(2001)) - lit(1000)) / lit(1000.0))
            .cast("float")).as("embedding"))
        .barrier()
      Seq(("250k", corpus(250000L)), ("1M", corpus(1000000L)))
        .foreach { case (label, c) =>
          Seq(("fixed mod 4", 4L), ("bounded", 0L)).foreach {
            case (mode, mod) =>
              val t0 = System.nanoTime()
              val book = graft.llm.Similarity
                .ivfCentroidsInt8(c, 256, sampleMod = mod)
              val ivfT = (System.nanoTime() - t0) / 1e9
              val t1 = System.nanoTime()
              val pq = graft.llm.Similarity
                .pqCodebooks(c, sampleMod = mod)
              val pqT = (System.nanoTime() - t1) / 1e9
              assert(book.length == 256 &&
                book.forall(_.forall(v => v >= -127 && v <= 127)))
              assert(pq.length == 8)
              println(f"[trainbound] $label%-5s $mode%-12s" +
                f" ivf-256 train $ivfT%6.2f s | pq books $pqT%6.2f s")
          }
        }
      spark.stop()
      return
    }

    if (args.contains("budget")) {
      // Token-budget probe: the naive form of per-domain budget
      // selection is ONE cumulative-sum window PARTITIONED BY lang —
      // and a web corpus is 40-90% one language, so the dominant
      // domain sorts and scans through a single task. The two-pass
      // class-histogram decomposition (Sampling.tokenBudget) claims
      // identical output with the doc-level window confined to each
      // domain's one boundary quality class. Synthesize the skew: 90%
      // of docs in lang "en", ~220 quality classes from a varying
      // letter/digit word mix. The transferable number is PEAK SINGLE
      // TASK: at 100 TB the naive window's peak task IS the job.
      import org.apache.spark.sql.expressions.Window
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      Seq("1x (2M docs)" -> 2000000L, "4x (8M docs)" -> 8000000L)
        .foreach { case (sizeLabel, nDocs) =>
          val letters = (col("id") % 17 + 1).cast("int") // 1..17 words
          val digits = (col("id") % 13).cast("int")      // 0..12 words
          val docs = spark.range(nDocs).select(
            when(col("id") % 10 < 9, lit("en"))
              .otherwise(concat(lit("l"), col("id") % 10)).as("lang"),
            col("id").as("doc_id"),
            array_join(concat(
              array_repeat(lit("aa"), letters),
              array_repeat(lit("11"), digits)), " ").as("text"))
            .barrier() // probe the operator, not the generation
          // budget scales with the corpus so the selection cuts at the
          // same relative depth (~1/3 of the dominant domain's tokens)
          val budget = nDocs * 5L
          def naive = {
            val q = coalesce(graft.llm.TextOps.alphaX10000OfText, lit(-1L))
            val base = docs.select(
              col("lang"), col("doc_id"), q.as("q_x10000"),
              size(graft.llm.TextOps.wsTokens(col("text"))).cast("bigint")
                .as("n_tokens"))
            val w = Window.partitionBy("lang")
              .orderBy(col("q_x10000").desc, col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            base.withColumn("cum", sum("n_tokens").over(w))
              .filter(col("cum") <= budget)
              .select("lang", "doc_id", "q_x10000", "n_tokens")
          }
          Seq("naive window" -> (() => naive),
            "two-pass" -> (() => graft.llm.Sampling.tokenBudget(docs, budget)))
            .foreach { case (label, mk) =>
              mk().count() // warm codegen/JIT
              val l = new TaskPeak
              spark.sparkContext.addSparkListener(l)
              val t0 = System.nanoTime()
              val rows = mk().count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(2000) // listener bus drains async
              spark.sparkContext.removeSparkListener(l)
              println(f"[budget-probe] $sizeLabel%-13s $label%-13s " +
                f"$rows%9d kept  $dt%7.2f s  " +
                f"peak task ${l.maxRunMs.get / 1e3}%6.2f s")
            }
          val tp = graft.llm.Sampling.tokenBudget(docs, budget)
          val diff = naive.exceptAll(tp).count() + tp.exceptAll(naive).count()
          println(s"[budget-probe] $sizeLabel symmetric diff rows = $diff (must be 0)")
        }
      spark.stop()
      return
    }

    if (args.contains("bloom")) {
      // Decontamination prefilter probe: shuffle-join decontamination
      // (the large-reference shape) with and without the Bloom sketch
      // prefilter. The sketch's claim is that it deletes the shuffle of
      // every CLEAN document's shingles before the verify join — the
      // testdata corpus can't show that (its ~31-token vocabulary makes
      // nearly every shingle match the reference), so synthesize the
      // web shape: unique-shingled docs with a 2% contaminated slice
      // that replicates the eval text.
      val evalText = "alpha beta gamma delta epsilon zeta eta theta"
      val uniq = translate(col("id").cast("string"),
        "0123456789", "abcdefghij")
      val corp = spark.range(1000000L).select(
        col("id").as("doc_id"),
        when(col("id") % 50 === 0, lit(evalText))
          .otherwise(concat_ws(" ",
            concat(lit("p"), uniq), concat(lit("q"), uniq),
            concat(lit("r"), uniq), concat(lit("s"), uniq),
            concat(lit("t"), uniq), concat(lit("u"), uniq))).as("text"))
        .barrier()
      val ref = spark.range(1).select(
        col("id").as("doc_id"), lit(evalText).as("text"))
      Seq(
        "shuffle join" -> (() =>
          graft.llm.Dedup.decontaminate(corp, ref, broadcastRef = false)),
        "bloom+verify" -> (() =>
          graft.llm.Dedup.decontaminateBloom(corp, ref))).foreach {
        case (label, mk) =>
          mk().count() // warm codegen/JIT (and bloom build)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val rows = mk().count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000) // listener bus drains async
          spark.sparkContext.removeSparkListener(l)
          println(f"[bloom-probe] $label%-13s $rows%7d flagged  $dt%7.2f s  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("substr")) {
      // Duplicate-substring probe: web-shaped corpus (unique filler
      // text, a 1-in-50 slice carrying one shared boilerplate passage)
      // at 1x and 4x. The claims to measure: the window table shuffles
      // as 16-byte hashes with MAP-SIDE COMBINE absorbing the viral
      // gram (its shuffle rows ~= partitions, not occurrences), and
      // wall time scales ~linearly in corpus size.
      val passage = (1 to 20).map(i => s"boiler$i").mkString(" ")
      def corp(nDocs: Long) = {
        val uniq = translate(col("id").cast("string"),
          "0123456789", "abcdefghij")
        spark.range(nDocs).select(
          col("id").as("doc_id"),
          concat_ws(" ",
            concat(lit("p"), uniq), concat(lit("q"), uniq),
            when(col("id") % 50 === 0, lit(passage)).otherwise(
              concat_ws(" ",
                concat(lit("r"), uniq), concat(lit("s"), uniq),
                concat(lit("t"), uniq), concat(lit("u"), uniq),
                concat(lit("v"), uniq), concat(lit("w"), uniq),
                concat(lit("x"), uniq), concat(lit("y"), uniq),
                concat(lit("z"), uniq), concat(lit("za"), uniq),
                concat(lit("zb"), uniq), concat(lit("zc"), uniq),
                concat(lit("zd"), uniq), concat(lit("ze"), uniq),
                concat(lit("zf"), uniq), concat(lit("zg"), uniq),
                concat(lit("zh"), uniq), concat(lit("zi"), uniq)))
          ).as("text")).barrier()
      }
      Seq("1x (500k docs)" -> 500000L, "4x (2M docs)" -> 2000000L)
        .foreach { case (label, n) =>
          val d = corp(n)
          graft.llm.Dedup.duplicateSpans(d).count() // warm
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val rows = graft.llm.Dedup.duplicateSpans(d)
            .filter(col("n_spans") > 0).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000) // listener bus drains async
          spark.sparkContext.removeSparkListener(l)
          println(f"[substr-probe] $label%-15s $rows%8d flagged  $dt%7.2f s  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
        }
      spark.stop()
      return
    }

    if (args.contains("pagerank")) {
      // PageRank probe: synthetic power-law-ish graph (dst biased hard
      // toward low ids -> hubs), fixed 5 rounds (tol=0 disables early
      // stop so 1x/4x run identical work per edge). Claims: per-round
      // cost is two co-partitioned joins + one algebraic aggregation,
      // scaling ~linearly in |E|; hub nodes are absorbed by map-side
      // combine on the contribution sum.
      def graph(nEdges: Long, nNodes: Long) = spark.range(nEdges).select(
        (col("id") % nNodes).as("src"),
        (pmod(col("id") * 2654435761L, lit(nNodes)) %
          (pmod(col("id") * 31, lit(997L)) + 1)).as("dst"),
        lit(1L).as("w")).barrier()
      Seq("1x (5M edges, 1M nodes)" -> ((5000000L, 1000000L)),
        "4x (20M edges, 4M nodes)" -> ((20000000L, 4000000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val rows = graft.ops.GraphOps.pageRank(g, iters = 5, tol = 0.0)
            .count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[pagerank-probe] $label%-26s $rows%9d nodes  $dt%7.2f s  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
        }
      spark.stop()
      return
    }

    if (args.contains("kcore")) {
      // k-core probe: a dense planted core (each core node wired to 8
      // distinct peers) over a SPARSE random periphery (avg degree ~2)
      // most of which peels away in the first rounds. Claims: per-round
      // cost is one degree aggregate + two node-keyed semi-joins over
      // the LIVE edge list, which shrinks monotonically — so later
      // rounds are nearly free and total scales ~linearly in |E|.
      def graph(nEdges: Long, nNodes: Long) = {
        val core = math.max(nNodes / 100, 16L)
        val periphery = spark.range(nEdges).select(
          pmod(col("id") * 1597334677L + 99991L, lit(nNodes)).as("u"),
          pmod(col("id") * 2654435761L + 11L, lit(nNodes)).as("v"))
        // id DIV core (integer) — col/long is DOUBLE division and
        // would silently make the core ids fractional (degree-1 ghost
        // nodes that peel instantly)
        val corePart = spark.range(core * 4).select(
          pmod(col("id"), lit(core)).as("u"),
          pmod(pmod(col("id"), lit(core)) +
            expr(s"(id DIV $core) * 2 + 1"), lit(core)).as("v"))
        periphery.unionByName(corePart)
          .filter(col("u") =!= col("v"))
          .barrier()
      }
      Seq("1x (1M edges, 1M nodes)" -> ((1000000L, 1000000L)),
        "4x (4M edges, 4M nodes)" -> ((4000000L, 4000000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val rows = graft.ops.GraphOps.kCore(g, k = 3, iters = 4).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[kcore-probe] $label%-26s $rows%9d core nodes  " +
            f"$dt%7.2f s  shuffle write ${l.bytes.get / 1e6}%9.1f MB")
        }
      spark.stop()
      return
    }

    if (args.contains("ppr")) {
      // Personalized-PageRank probe (round-11 addition): same synthetic
      // hub-skewed graph family as the pagerank probe, fixed 8 unrolled
      // rounds. Claims: per-round cost is one co-partitioned
      // contribution join + one algebraic aggregation, ~linear in |E|;
      // the 1-row seed is the only broadcast; checkpoint blocks are
      // freed per round. The result checksum (xor of row hashes) makes
      // re-runs comparable — PPR is scaled-integer deterministic.
      def graph(nEdges: Long, nNodes: Long) = spark.range(nEdges).select(
        (col("id") % nNodes).as("u"),
        (pmod(col("id") * 2654435761L, lit(nNodes)) %
          (pmod(col("id") * 31, lit(997L)) + 1)).as("v"),
        lit(1L).as("w"))
        .filter(col("u") =!= col("v"))
        .barrier()
      Seq("1x (1M edges, 200k nodes)" -> ((1000000L, 200000L)),
        "4x (4M edges, 800k nodes)" -> ((4000000L, 800000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.ops.GraphOps.personalizedPageRankScaled(g)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(part_key, rank_scaled))").as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[ppr-probe] $label%-26s ${res.getLong(0)}%9d nodes  " +
            f"$dt%7.2f s  shuffle write ${l.bytes.get / 1e6}%9.1f MB  " +
            f"chk ${res.getLong(1)}%d")
        }
      spark.stop()
      return
    }

    if (args.contains("sssp")) {
      // Bounded-round Bellman-Ford probe: same hub-skewed family as
      // the ppr probe. Claims: per-round cost is one co-partitioned
      // dist-edge join + a map-side-combinable min keyed by node,
      // ~linear in |E|; frontier state is node-bounded.
      def graph(nEdges: Long, nNodes: Long) = spark.range(nEdges).select(
        (col("id") % nNodes).as("u"),
        (pmod(col("id") * 2654435761L, lit(nNodes)) %
          (pmod(col("id") * 31, lit(997L)) + 1)).as("v"),
        (pmod(col("id"), lit(9L)) + 1L).as("w"))
        .filter(col("u") =!= col("v"))
        .barrier()
      Seq("1x (1M edges, 200k nodes)" -> ((1000000L, 200000L)),
        "4x (4M edges, 800k nodes)" -> ((4000000L, 800000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.ops.GraphOps.ssspScaled(g)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(part_key, dist_cost))").as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[sssp-probe] $label%-26s ${res.getLong(0)}%9d nodes  " +
            f"$dt%7.2f s  shuffle write ${l.bytes.get / 1e6}%9.1f MB  " +
            f"chk ${res.getLong(1)}%d")
        }
      spark.stop()
      return
    }

    if (args.contains("lpa")) {
      // Label-propagation probe (round-11 addition): planted
      // communities — nodes partitioned into blocks of 64, intra-block
      // edges dense, a sparse random inter-block background — so
      // propagation has real structure to converge on. Claims:
      // per-round cost is one co-partitioned vote join + a windowed
      // argmax partitioned by node, ~linear in |E|; label tables are
      // checkpointed and freed per round.
      def graph(nEdges: Long, nNodes: Long) = {
        val intra = spark.range(nEdges * 3 / 4)
          .select(pmod(col("id") * 48271L, lit(nNodes)).as("u"),
            col("id").as("id"))
          .select(col("u"),
            (expr("u DIV 64") * 64L + pmod(col("id") * 16807L, lit(64L)))
              .as("v"),
            lit(2L).as("w"))
        val inter = spark.range(nEdges / 4).select(
          pmod(col("id") * 1597334677L, lit(nNodes)).as("u"),
          pmod(col("id") * 2654435761L, lit(nNodes)).as("v"),
          lit(1L).as("w"))
        intra.unionByName(inter)
          .filter(col("u") =!= col("v")).barrier()
      }
      Seq("1x (2M edges, 500k nodes)" -> ((2000000L, 500000L)),
        "4x (8M edges, 2M nodes)" -> ((8000000L, 2000000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.ops.GraphOps.labelPropagation(g)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(part_key, community))").as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[lpa-probe] $label%-26s ${res.getLong(0)}%9d nodes  " +
            f"$dt%7.2f s  shuffle write ${l.bytes.get / 1e6}%9.1f MB  " +
            f"chk ${res.getLong(1)}%d")
        }
      spark.stop()
      return
    }

    if (args.contains("hits")) {
      // HITS probe (round-12 addition, heaviest new op of that round):
      // same hub-skewed synthetic family as the pagerank/ppr probes,
      // fixed 6 rounds. Claims: per round TWO co-partitioned edge
      // joins + two algebraic aggregations (authority from hubs, hubs
      // from authorities) -> expect ~2x the ppr per-round cost and
      // ~linear wall/shuffle in |E|; the only broadcasts are the two
      // 1-row per-round maxima (max-norm). Scaled-integer arithmetic
      // makes re-runs checksum-comparable.
      def graph(nEdges: Long, nNodes: Long) = spark.range(nEdges).select(
        (col("id") % nNodes).as("src"),
        (pmod(col("id") * 2654435761L, lit(nNodes)) %
          (pmod(col("id") * 31, lit(997L)) + 1)).as("dst"),
        (pmod(col("id"), lit(5L)) + 1L).as("w"))
        .filter(col("src") =!= col("dst"))
        .barrier()
      Seq("1x (1M edges, 200k nodes)" -> ((1000000L, 200000L)),
        "4x (4M edges, 800k nodes)" -> ((4000000L, 800000L)))
        .foreach { case (label, (e, nn)) =>
          val g = graph(e, nn)
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.ops.GraphOps.hitsScaled(g)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(node, hub_scaled, auth_scaled))")
                .as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          println(f"[hits-probe] $label%-26s ${res.getLong(0)}%9d nodes  " +
            f"$dt%7.2f s  shuffle write ${l.bytes.get / 1e6}%9.1f MB  " +
            f"chk ${res.getLong(1)}%d")
        }
      spark.stop()
      return
    }

    if (args.contains("rm3")) {
      // RM3 probe (round-12 addition): the expansion pays the BM25
      // generator twice (feedback pass + expanded pass) and mines
      // expansion terms from an answer-sized feedback list. Same
      // corpus-replication scheme as the retrieval probe (1-in-97
      // queries, so the query batch grows WITH the corpus). Claim:
      // both passes are term-bucketed and candidate-bounded — expect
      // the retrieval probe's ~linear envelope at ~2x its constant,
      // never corpus x corpus. Result rows should be exactly 4x at 4x
      // (4x queries x top-5).
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = rep(base, Seq("doc_id"), n).barrier()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.CorpusOps.retrievalRm3(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(q_id, c_id, rank))").as("chk"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[rm3-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"rm3 $dt%6.2f s  (${res.getLong(0)}%6d rows, " +
          f"chk ${res.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("kll")) {
      // KLL-lite probe (round-13 addition): the sketch half is one
      // map-side level filter producing ~2k rows/group; the exact-
      // median and true-rank ground-truth halves pay per-group sorts.
      // Claim: wall ~linear in the corpus (the truth half's sort
      // dominates), shuffle bounded by corpus row count (the sort
      // exchange), sample aggregates answer-sized. Result rows stay
      // PANEL-sized (one per source + __all__) at every scale.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "source", "n_chars")
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = rep(base, Seq("doc_id"), n).barrier()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.CorpusOps.kllSketch(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(source, n_docs, level_h, sketch_size," +
              " est_p50, exact_p50, rank_err))").as("chk"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[kll-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"kll $dt%6.2f s  (${res.getLong(0)}%3d panel rows, " +
          f"chk ${res.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("classifier")) {
      // Classifier-training probe (round-13 addition): 8 GD rounds on
      // the 64-bucket hashed logistic model. Claim: one corpus-sized
      // feature materialization, then per round a 64-row broadcast
      // model join + doc-keyed z agg + 64-key gradient agg (map-side
      // combined) — every per-round shuffle is bounded by docs (z) or
      // the model (gradient), so wall and shuffle should grow ~linear
      // in the corpus, with the fixed per-round cost amortizing like
      // PageRank's. A super-linear jump would mean a round re-pays
      // something corpus x corpus.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = rep(base, Seq("doc_id"), n).barrier()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.Curation.classifierTrain(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(round, sq_loss, n_correct))").as("chk"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[classifier-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"train $dt%6.2f s  (${res.getLong(0)}%3d eval rows, " +
          f"chk ${res.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("pca")) {
      // PCA probe (round-13 addition): the scatter matrix is built by
      // ONE typed ScatterAgg pass — each partition accumulates a flat
      // 4161-long buffer (64x64 upper-triangle sums + 64 dim sums +
      // count) with fused multiply-adds, no explode — so the shuffle
      // is exactly one buffer per partition (sketch-sized, constant in
      // the corpus). The 8 power rounds then run DRIVER-SIDE on BigInt
      // (the RowMatrix-PCA shape: distribute the Gramian pass, never
      // the 64x64 matvecs), bit-identical to the oracle's HUGEINT
      // recurrence. Claim: wall ~linear in vectors, shuffle ~0, power
      // rounds invariant between scales. Synthetic replication of the
      // embeddings table (ids shifted per replica).
      val base = Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding", "label")
      Seq("1x" -> 1, "16x" -> 16).foreach { case (label, n) =>
        val d = rep(base, Seq("vec_id"), n).barrier()
        val cnt = d.count()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.Similarity.pcaPower(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(dim, eig_micro, var_explained_permille))")
              .as("chk"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[pca-probe] $label%-4s vecs $cnt%8d  " +
          f"pca $dt%6.2f s  (${res.getLong(0)}%3d rows, " +
          f"chk ${res.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("contrastive")) {
      // Contrastive-mining probe (round-14 verdict #6): the suite's
      // most expensive query. Claim: cost is PAIR-LIST-BOUNDED — the
      // positive argmax halves are map-side-combinable aggs over the
      // pair list, and negative candidates are <= NegProbe(8)
      // hash-ring rows per anchor, LINEAR by construction (never
      // cell x cell). Plain replication would lie here: identical
      // clone texts pair at jaccard 1.0 ACROSS replicas and square
      // the pair list. So each replica's tokens get a replica-unique
      // letter prefix — a per-replica token bijection that leaves
      // every within-replica jaccard identical and makes
      // cross-replica overlap exactly 0. 4x docs => exactly 4x pairs
      // and 4x anchors by construction, so wall and shuffle should
      // read ~linear; and at 1x the checksum must be invariant across
      // salt settings (salting only re-buckets, never changes pairs).
      // OUTPUT rows are anchors-that-found-a-valid-negative, which
      // RISES super-linearly under replication: the (lang, octave)
      // cells mix replicas, so an anchor's 8 hash-ring candidates are
      // mostly other-replica docs that can never be secret partners
      // and survive the anti-join (at 1x a giant-cluster anchor's
      // whole ring is partners and it emits nothing). That is
      // negative-mining RICHNESS, not cost — the cost claims read on
      // the pair count (exactly linear), wall, and shuffle.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "lang", "text")
      def corpus(n: Int) = (0 until n).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"z$i$$1"))
      }.reduce(_ unionAll _).barrier()
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = corpus(n)
        val nPairs = graft.llm.Dedup.jaccardPairs(d, 0.5).count()
        var seen = Set.empty[(Long, Long)]
        val salts = if (n == 1) Seq("salt512" -> 512,
          "unsalted" -> Int.MaxValue) else Seq("salt512" -> 512)
        salts.foreach { case (sl, st) =>
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.llm.Dedup.contrastivePairs(d, saltTarget = st)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(anchor_id, pos_id, pos_jaccard," +
                " neg_id, neg_len_diff))").as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          seen += ((res.getLong(0), res.getLong(1)))
          println(f"[contrastive-probe] $label%-4s docs ${n * 60000}%8d  " +
            f"pairs $nPairs%9d  $sl%-9s $dt%7.2f s  " +
            f"(${res.getLong(0)}%7d rows, chk ${res.getLong(1)}%d)  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
        }
        require(seen.size == 1, s"salting changed the result: $seen")
      }
      spark.stop()
      return
    }

    if (args.contains("venn")) {
      // Detector-Venn probe (round-15 verdict #6): three detectors
      // (jaccard, shingle, winnow) each emit a pair list; the Venn is
      // per-pair flag union + a 7-cell histogram. Claim: cost is the
      // SUM of the three detectors' pair-list-bounded costs — the
      // union/groupBy rides answer-sized data, so wall and shuffle
      // read ~linear under the per-replica token bijection (each
      // replica's detectors see an isomorphic corpus; cross-replica
      // overlap of any detector is exactly 0). Per-replica pair SETS
      // are not bit-identical across replicas (hashes differ under the
      // bijection) so the histogram grows ~4x, not exactly — the probe
      // reports total flagged pairs alongside wall/shuffle.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      def corpus(n: Int) = (0 until n).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"z$i$$1"))
      }.reduce(_ unionAll _).barrier()
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = corpus(n)
        graft.llm.Dedup.detectorVenn(d).count() // warm
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.Dedup.detectorVenn(d)
          .agg(sum(col("n_pairs")).as("pairs"), count(lit(1)).as("cells"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[venn-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"$dt%7.2f s  (${res.getLong(0)}%8d pairs in " +
          f"${res.getLong(1)}%d cells)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("minhashcalib")) {
      // MinHash-calibration probe (round-15 verdict #6): LSH candidate
      // pairs scored against exact shingle jaccard via FOUR doc_id
      // joins (sigs x2, shingle sets x2). Claim: candidate-bounded —
      // the joins' probe side is the pair list, so 4x docs (per-replica
      // token bijection, cross-replica collisions impossible at the
      // exact-jaccard stage and vanishingly rare at the banding stage)
      // costs ~4x wall/shuffle, never pairs^2. Signature/set builds are
      // corpus-linear by construction.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      def corpus(n: Int) = (0 until n).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"z$i$$1"))
      }.reduce(_ unionAll _).barrier()
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = corpus(n)
        graft.llm.Dedup.minhashCalibration(d).count() // warm
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.llm.Dedup.minhashCalibration(d)
          .agg(sum(col("n_pairs")).as("pairs"), count(lit(1)).as("bands"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[minhashcalib-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"$dt%7.2f s  (${res.getLong(0)}%8d scored pairs in " +
          f"${res.getLong(1)}%d err bands)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("edit")) {
      // Edit-verified-pairs A/B probe (round-15 verdict #2): two
      // spellings of the SAME operator — heads riding the candidate
      // join as exploded-prefix-row payload vs heads RE-FETCHED by two
      // pair-probed joins after a payload-free candidate join. Both
      // must emit the identical pair set (checksummed); the replication
      // scheme is the contrastive probe's per-replica token bijection
      // (cross-replica jaccard exactly 0, so 4x docs => exactly 4x
      // pairs) with heads ALSO prefixed per replica so edit distances
      // stay within-replica-identical. The winner ships as
      // editVerifiedPairs; BASELINE.md records both columns.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      def corpus(n: Int) = (0 until n).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"z$i$$1"))
      }.reduce(_ unionAll _).barrier()
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = corpus(n)
        var seen = Set.empty[(Long, Long)]
        Seq(
          "payload" ->
            (() => graft.llm.Dedup.editVerifiedPairsPayload(d)),
          "refetch" ->
            (() => graft.llm.Dedup.editVerifiedPairs(d))
        ).foreach { case (sl, mk) =>
          mk().count() // warm: codegen + page cache out of the sample
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = mk()
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(doc_a, doc_b, jaccard, edit_60))")
                .as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          seen += ((res.getLong(0), res.getLong(1)))
          println(f"[edit-probe] $label%-4s docs ${n * 60000}%8d  " +
            f"$sl%-8s $dt%7.2f s  " +
            f"(${res.getLong(0)}%7d pairs, chk ${res.getLong(1)}%d)  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
        }
        require(seen.size == 1,
          s"payload and refetch spellings disagree: $seen")
      }
      spark.stop()
      return
    }

    if (args.contains("entity")) {
      // Entity-resolution probe (round-14 addition): the blocked
      // fuzzy self-join's cost is Σ(block size²) — linear in the
      // catalog ONLY while block structure is preserved. Replicas get
      // a per-replica brand suffix so blocks stay disjoint across
      // replicas (plain replication would co-block identical rows and
      // square the in-block candidates): 4x rows => exactly 4x blocks
      // of the SAME sizes => exactly 4x pairs, ~linear wall/shuffle.
      // Checksum identical across re-runs (deterministic join).
      val base = Tables.load(spark, dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size",
          "p_retailprice")
      def corpus(n: Int) = (0 until n).map { i =>
        base.select(
          (col("p_partkey") + lit(i * 100000000L)).as("p_partkey"),
          col("p_name"),
          concat(col("p_brand"), lit(s"_r$i")).as("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice"))
      }.reduce(_ unionAll _).barrier()
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = corpus(n)
        val rows = d.count()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val res = graft.ops.EntityOps.entityPairs(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(part_a, part_b, name_edit))").as("chk"))
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[entity-probe] $label%-4s rows $rows%8d  " +
          f"pairs ${res.getLong(0)}%8d  $dt%6.2f s  " +
          f"(chk ${res.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      // HOT-BLOCK leg: a commodity block with 5,000 identical-name
      // listings — the honest output is all n²/2 ≈ 12.5M true pairs
      // from ONE block. Run under the SHUFFLE-join regime
      // (autoBroadcastJoinThreshold=-1): that is the regime salting
      // exists for — a shuffle join partitions BY the block key, so
      // unsalted the whole block is ONE task (output explosion AQE
      // cannot split: its inputs are tiny), while salting splits it
      // across nsalt sub-buckets. (Under a broadcast join the probe
      // side's natural partitioning already spreads output skew —
      // measured while landing this probe, see pairsFrom.) Count and
      // checksum must be identical across settings.
      final class TaskPeak extends org.apache.spark.scheduler.SparkListener {
        val maxRunMs = new java.util.concurrent.atomic.AtomicLong(0L)
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            maxRunMs.getAndAccumulate(t.taskMetrics.executorRunTime, math.max)
      }
      val hot = base.unionAll(
        spark.range(5000L).select(
          (col("id") + 900000000L).as("p_partkey"),
          lit("hot commodity sku").as("p_name"),
          lit("Brand#HOT").as("p_brand"), lit("ECONOMY").as("p_type"),
          lit(1).cast("int").as("p_size"),
          lit(1.0).as("p_retailprice"))).barrier()
      var seen = Set.empty[(Long, Long)]
      val prevBroadcast =
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE partition coalescing is left at its DEFAULT (on): round 15
      // moved the defense into Salting.saltedSides itself — the probe
      // re-spread pins an explicit partition count (REPARTITION_BY_NUM),
      // which excludes the join's coalesce group from AQE coalescing.
      // r14 measured the unprotected regime: salt1024 peak == unsalted
      // peak (105 s) with coalescing re-merging the sub-buckets, 18 s
      // with them preserved. This leg now proves the in-operator pin
      // holds under an untouched session config.
      try {
        Seq("unsalted" -> -1, "salt1024" -> 1024).foreach { case (sl, st) =>
          graft.ops.EntityOps.entityPairs(hot, saltTarget = st).count() // warm
          val l = new TaskPeak
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val res = graft.ops.EntityOps.entityPairs(hot, saltTarget = st)
            .agg(count(lit(1)).as("n"),
              expr("bit_xor(xxhash64(part_a, part_b, name_edit))").as("chk"))
            .collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          spark.sparkContext.removeSparkListener(l)
          seen += ((res.getLong(0), res.getLong(1)))
          println(f"[entity-probe] hot-block(shuffle-join) $sl%-9s " +
            f"pairs ${res.getLong(0)}%9d  $dt%6.2f s  " +
            f"peak task ${l.maxRunMs.get / 1e3}%6.2f s  " +
            f"(chk ${res.getLong(1)}%d)")
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      }
      require(seen.size == 1, s"salting changed the result: $seen")
      spark.stop()
      return
    }

    if (args.contains("retrieval")) {
      // Retrieval probe (round-11 additions): BM25 top-k join and MMR
      // diversification over the real documents table replicated 1x/4x
      // (ids shifted per replica; the 1-in-97 query rule then selects
      // ~4x queries at 4x corpus — the serving fan-out grows WITH the
      // corpus here by design). Claims: the BM25 join is term-bucketed
      // (cost ~ sum of per-term posting x query-term products, never
      // corpus x corpus), the rank/top-k is window-partitioned per
      // query, and MMR's greedy rounds are bounded by poolK so its
      // cost past candidate generation is answer-sized. Expect
      // ~linear wall and shuffle growth; a super-linear jump would
      // mean a corpus-bounded stage slipped in.
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      Seq("1x" -> 1, "4x" -> 4).foreach { case (label, n) =>
        val d = rep(base, Seq("doc_id"), n).barrier()
        val l = new ShuffleSum
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        val rj = graft.llm.CorpusOps.retrievalJoin(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(q_id, c_id, rank))").as("chk"))
          .collect()(0)
        val t1 = System.nanoTime()
        val mm = graft.llm.CorpusOps.retrievalMmr(d)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(q_id, c_id))").as("chk"))
          .collect()(0)
        val t2 = System.nanoTime()
        Thread.sleep(2000)
        spark.sparkContext.removeSparkListener(l)
        println(f"[retrieval-probe] $label%-4s docs ${n * 60000}%8d  " +
          f"bm25join ${(t1 - t0) / 1e9}%6.2f s (${rj.getLong(0)}%7d rows, " +
          f"chk ${rj.getLong(1)}%d)  mmr ${(t2 - t1) / 1e9}%6.2f s " +
          f"(${mm.getLong(0)}%6d rows, chk ${mm.getLong(1)}%d)  " +
          f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("freq")) {
      // Heavy-hitters probe: the testdata corpus's ~31-token vocabulary
      // can't show what Misra-Gries buys, because the direct groupBy's
      // shuffle is 31 keys. Synthesize the REAL shape — a web-scale
      // vocabulary where almost every token is unique (URLs, typos,
      // hashes) and a few terms are hot — and compare the direct
      // full-vocabulary groupBy against the sketch+recount on wall
      // time and TOTAL SHUFFLE WRITE (locally shuffle is a memcpy; on
      // a 1000-executor cluster it's the network, so bytes are the
      // transferable number).
      val nDocs = 5000000L
      // 5 tokens/doc: one from a small hot set on 2/7 of docs, plus
      // unique-per-doc fillers (digits->letters: letterTokens strips
      // digits). ~21.4M distinct tokens, 25M total.
      val uniq = translate(col("id").cast("string"),
        "0123456789", "abcdefghij")
      val synth = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          when(col("id") % 7 === 0, lit("alpha"))
            .when(col("id") % 7 === 1, lit("beta"))
            .otherwise(concat(lit("x"), uniq)),
          concat(lit("p"), uniq), concat(lit("q"), uniq),
          concat(lit("r"), uniq), concat(lit("s"), uniq)).as("text"))
        .barrier() // probe the aggregation, not range+concat
      val phi = 0.02
      def direct(): DataFrame = {
        val toks = synth.select(
          explode(graft.llm.TextOps.letterTokens(col("text"))).as("tok"))
        val n = toks.count()
        toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= math.ceil(phi * n).toLong)
      }
      Seq(
        "direct groupBy" -> (() => direct()),
        "MG sketch+recount" -> (() =>
          graft.llm.CorpusOps.freqTerms(synth, phi = phi))).foreach {
        case (label, mk) =>
          mk().count() // warm codegen/JIT
          val l = new ShuffleSum
          spark.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          val rows = mk().count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000) // listener bus drains async
          spark.sparkContext.removeSparkListener(l)
          println(f"[freq-probe] $label%-18s $rows%3d frequent  $dt%7.2f s  " +
            f"shuffle write ${l.bytes.get / 1e6}%9.1f MB")
      }
      spark.stop()
      return
    }

    if (args.contains("pq")) {
      // PQ probe: the number PQ exists for is INDEX FOOTPRINT — the
      // corpus side of an ANN scan at 100 TB lives in (executor)
      // memory or gets re-read per query batch, so bytes/vector is the
      // scale story. Materialize the same synthetic corpus three ways
      // (float32 arrays, packed int8, 8-byte PQ codewords) and report
      // parquet bytes/vector; then time a top-k scan in the float
      // spelling vs the ADC spelling over the code-sized corpus.
      import graft.llm.Similarity
      def corpus(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(hash(col("id"), i), lit(2001)) - lit(1000)) / lit(1000.0))
            .cast("float")).as("embedding"))
        .barrier()
      val c = corpus(1000000L)
      val books = Similarity.pqCodebooks(c)
      val tmp = java.nio.file.Files.createTempDirectory("graft-pq-probe")
      def sizeOf(name: String, df: DataFrame): Double = {
        val p = tmp.resolve(name)
        df.write.mode("overwrite").parquet(p.toString)
        val bytes = java.nio.file.Files.walk(p).filter(f =>
          f.toString.endsWith(".parquet")).mapToLong(f =>
          java.nio.file.Files.size(f)).sum()
        bytes / 1e6
      }
      val fMb = sizeOf("float", c)
      val iMb = sizeOf("int8", c.select(col("vec_id"),
        graft.functions.vector.pack_int8(
          transform(col("embedding"), v =>
            round(v.cast("double") * 127.0, 0).cast("bigint"))).as("qb")))
      val pMb = sizeOf("pq", Similarity.pqEncode(c, books)
        .select("vec_id", "codeword"))
      println(f"[pq-probe] index footprint, 1M x 64-dim: " +
        f"float32 $fMb%7.1f MB | packed int8 $iMb%7.1f MB | " +
        f"pq codes $pMb%7.1f MB (+ 8 KB codebook)")
      // scan cost at equal semantics (top-10 of 50 queries vs corpus):
      // the float brute scan carries 256 B/vector through the scan;
      // the ADC scan reads 8 B/vector and reconstructs from the
      // broadcast codebook
      val c4 = corpus(400000L)
      val books4 = Similarity.pqCodebooks(c4)
      // the deployment shape: the code table is the STORED index
      // (built once), queries arrive as fresh batches
      val index4 = Similarity.pqEncode(c4, books4)
        .select("vec_id", "codeword").barrier()
      def timed(label: String)(mk: => DataFrame): Unit = {
        mk.count() // warm
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[pq-probe] $label%-34s $dt%7.2f s  ($n rows)")
      }
      timed("float brute top-10, 50q x 400k")(
        Similarity.bruteForceTopK(c4, nQueries = 50, k = 10))
      timed("pq adc from codes, 50q x 400k")(
        Similarity.pqTopKFromCodes(index4, books4,
          c4.filter(col("vec_id") < 50), k = 10))
      spark.stop()
      return
    }

    def timeWarm(name: String)(mk: => DataFrame): Double = {
      mk.count() // warm: codegen + JIT
      val t0 = System.nanoTime()
      val n = mk.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $dt%7.2f s  ($n rows)")
      dt
    }

    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val docs = Tables.load(spark, dir, "documents")
    val ev = Tables.load(spark, dir, "events")

    case class Probe(name: String, mk1: () => DataFrame, mk10: () => DataFrame)
    def q1Agg(l: DataFrame) = l
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    def joinAgg(l: DataFrame, o: DataFrame) = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    def sigs(d: DataFrame) = Layout.spread(d, "doc_id")
      .select(col("doc_id"),
        graft.functions.text.minhash_signature(col("text"),
          Seq(7L, 13L, 29L, 31L), Seq(3L, 5L, 11L, 17L), 2147483647L).as("s"))
      .select(sum(element_at(col("s"), 1)).as("x"))
    def exactDedup(d: DataFrame) = d
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    def winRank(o: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    def asofN(e: DataFrame) = {
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          unix_micros(col("ts")).as("pt"))
      val c = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("ct"))
        .agg(max("event_id").as("cid"))
      graft.ops.AsOfJoin.asOfNative(p, c, Seq("user_id"), "pt", "ct")
    }

    val li10 = rep(li, Seq("l_orderkey"), 10)
    val ord10 = rep(ord, Seq("o_orderkey", "o_custkey"), 10)
    val docs10 = rep(docs, Seq("doc_id"), 10)
    val ev10 = rep(ev, Seq("event_id", "user_id"), 10)

    val probes = Seq(
      Probe("agg (q1 core)", () => q1Agg(li), () => q1Agg(li10)),
      Probe("join+agg (q3 core)",
        () => joinAgg(li, ord), () => joinAgg(li10, ord10)),
      Probe("minhash sigs (kernel)", () => sigs(docs), () => sigs(docs10)),
      Probe("exact dedup (md5 groupBy)",
        () => exactDedup(docs), () => exactDedup(docs10)),
      Probe("window top-3 per key", () => winRank(ord), () => winRank(ord10)),
      Probe("native as-of join", () => asofN(ev), () => asofN(ev10)),
      // 10x orders with the same parts-per-order => ~10x edge
      // instances; the degree-ordered wedge join must track the edge
      // count, not the degree blow-up
      Probe("triangles (degree-ordered)",
        () => graft.ops.GraphOps.triangleCounts(
          graft.ops.GraphOps.coOccurrenceEdges(li)),
        () => graft.ops.GraphOps.triangleCounts(
          graft.ops.GraphOps.coOccurrenceEdges(li10))),
      Probe("attribution (journey windows)",
        () => graft.ops.EventOps.attribution(ev),
        () => graft.ops.EventOps.attribution(ev10)))

    println(f"${"operator"}%-28s ${"1x"}%8s ${"10x"}%9s  ratio")
    probes.foreach { p =>
      val t1 = timeWarm(p.name + " @1x")(p.mk1())
      val t10 = timeWarm(p.name + " @10x")(p.mk10())
      println(f"${p.name}%-28s $t1%7.2f s $t10%7.2f s  ${t10 / t1}%5.1fx")
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev A/B/C: the same iterative queries under the LOCAL barrier, the
  * FLAT reliable barrier (checkpoint files every round — everyK=1),
  * and the EVERY-K reliable barrier (RoundBarrier default k=4) in one
  * local session — quantifies what a cluster deployment pays for
  * executor-loss-safe lineage truncation, and what the Pregel-style
  * every-k discipline buys back (checkpoint files on the local fs
  * here; a shared store on a real cluster adds its own I/O).
  * Usage: runMain graft.tools.BarrierProf [sfDir] [q ...]
  */
object BarrierProf {

  /** `runMain graft.tools.BarrierProf sweep [sfDir]` — the everyK
    * parameter sweep at PRODUCTION-ish round counts (the default k=4
    * was picked from 8-round profiles; this is the evidence at the
    * round counts where the trade actually matters): classifier GD
    * forced to 50 rounds and scaled PageRank at 20 rounds, k in
    * {1,2,4,8,16}, reporting wall (min of 2), reliable-checkpoint MB
    * written, and the worst-case recovery depth the k buys (k-1
    * persisted rounds recomputed from the last checkpoint after an
    * executor loss — the bound BarrierSpec/LocalClusterSpec prove by
    * actually destroying blocks; here it is the analytic column the
    * wall/bytes trade is judged against).
    */
  private def sweep(sfDir: String, extra: Seq[String]): Unit = {
    val spark = session()
    // `+eager` token: override lazy call sites via
    // spark.graft.barrier.eagerRounds (per-job depth 1 between
    // checkpoints); remaining tokens filter families by substring
    if (extra.contains("+eager"))
      spark.conf.set("spark.graft.barrier.eagerRounds", "true")
    val famFilter = extra.filterNot(_ == "+eager")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // absorb startup
    val families: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("classifier_gd_r50", () =>
        graft.llm.Curation.classifierTrained(
          graft.core.Tables.load(spark, sfDir, "documents"), rounds = 50)),
      ("pagerank_i20", () =>
        graft.ops.GraphOps.pageRankScaled(
          graft.ops.GraphOps.eventTransitions(
            graft.core.Tables.load(spark, sfDir, "events")), iters = 20)))
    println(f"${"family"}%-20s ${"k"}%4s ${"wall_s"}%8s ${"ckpt_MB"}%9s " +
      "max_recovery_depth")
    families.filter(f => famFilter.isEmpty ||
      famFilter.exists(f._1.contains)).foreach { case (name, build) =>
      def run(mode: String, k: Int): (Double, Double) = {
        spark.conf.set("spark.graft.barrier", mode)
        spark.conf.set("spark.graft.barrier.everyK", k.toString)
        graft.core.Barrier.reliableBytesWritten.set(0L)
        try {
          val t0 = System.nanoTime(); build().count()
          ((System.nanoTime() - t0) / 1e9,
            graft.core.Barrier.reliableBytesWritten.get / 1e6)
        } finally {
          spark.conf.set("spark.graft.barrier", "auto")
          spark.conf.unset("spark.graft.barrier.everyK")
        }
      }
      run("local", 1) // warm codegen + scan cache
      val l = math.min(run("local", 1)._1, run("local", 1)._1)
      println(f"$name%-20s ${"loc"}%4s $l%8.2f ${0.0}%9.1f  -")
      Seq(1, 2, 4, 8, 16).foreach { k =>
        val (w1, b1) = run("reliable", k); val (w2, b2) = run("reliable", k)
        println(f"$name%-20s $k%4d ${math.min(w1, w2)}%8.2f " +
          f"${math.max(b1, b2)}%9.1f  ${k - 1}")
      }
    }
    spark.stop()
  }

  /** `runMain graft.tools.BarrierProf rehearse <sfDir0.1> <sfDir1>` —
    * the sf1 REHEARSAL of the RoundBarrier loops (round-17 verdict #2):
    * every checkpoint-every-k family in RELIABLE mode (k=4 default) at
    * both scales, reporting wall (min of 2) and reliable-checkpoint MB
    * written, plus the 10x ratios. The r14 rehearsal predates
    * RoundBarrier/truncatePlan; this validates the recompute-depth /
    * write-volume trade at 10x the data, where the trade matters.
    */
  private def rehearse(dirs: Seq[String]): Unit = {
    val spark = session()
    val families = Seq("q_text_classifier_train", "q_graph_pagerank",
      "q_dedup_clusters", "q_entity_golden")
    println(f"${"family"}%-26s ${"sf"}%-14s ${"wall_s"}%8s ${"ckpt_MB"}%9s")
    val walls = scala.collection.mutable.Map.empty[(String, String), Double]
    val bytes = scala.collection.mutable.Map.empty[(String, String), Double]
    dirs.foreach { d =>
      spark.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag").count().count() // absorb scan startup
      families.foreach { n =>
        val fn = SparkEntry.queries(n)
        def run(): (Double, Double) = {
          spark.conf.set("spark.graft.barrier", "reliable")
          graft.core.Barrier.reliableBytesWritten.set(0L)
          try {
            val t0 = System.nanoTime(); fn(spark, d).count()
            ((System.nanoTime() - t0) / 1e9,
              graft.core.Barrier.reliableBytesWritten.get / 1e6)
          } finally spark.conf.set("spark.graft.barrier", "auto")
        }
        run() // warm codegen + scan cache: measure the loop, not startup
        val (w1, b1) = run(); val (w2, b2) = run()
        val tag = new java.io.File(d).getName
        walls((n, tag)) = math.min(w1, w2); bytes((n, tag)) = math.max(b1, b2)
        println(f"$n%-26s $tag%-14s ${math.min(w1, w2)}%8.2f " +
          f"${math.max(b1, b2)}%9.1f")
      }
    }
    if (dirs.size == 2) {
      val (t0, t1) =
        (new java.io.File(dirs.head).getName, new java.io.File(dirs(1)).getName)
      println(f"%n${"family"}%-26s wall_ratio  ckpt_ratio   ($t1 / $t0)")
      families.foreach { n =>
        println(f"$n%-26s ${walls((n, t1)) / walls((n, t0))}%9.2fx " +
          f"${bytes((n, t1)) / math.max(bytes((n, t0)), 0.001)}%10.2fx")
      }
    }
    spark.stop()
  }

  private def session(): SparkSession =
    SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sweep") ||
        args.headOption.contains("rehearse")) {
      val s = session()
      s.conf.set("spark.graft.memoize", "false")
      s.sparkContext.setLogLevel("ERROR")
      if (args.head == "sweep")
        sweep(args.drop(1).headOption.getOrElse("/root/testdata/sf0.1"),
          args.drop(2).toSeq)
      else rehearse(
        if (args.length > 1) args.drop(1).toSeq
        else Seq("/root/testdata/sf0.1", "target/sf1"))
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_clusters", "q_graph_pagerank",
        "q_text_classifier_train", "q_graph_communities")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.conf.set("spark.graft.memoize", "false") // measure the op, not a cache hit
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // absorb startup
    println(f"${"query"}%-26s local    rel-flat  flat-x   rel-k4   k4-x" +
      "   flatMB    k4MB")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // (seconds, reliable-checkpoint MB written) — the byte column is
      // the load-insensitive metric: wall clock on local[*] mostly
      // measures job-scheduling overhead, while checkpoint WRITE VOLUME
      // is the shared-store bill a cluster pays; every-k cuts it ~k-fold
      def run(mode: String, everyK: Int): (Double, Double) = {
        spark.conf.set("spark.graft.barrier", mode)
        spark.conf.set("spark.graft.barrier.everyK", everyK.toString)
        graft.core.Barrier.reliableBytesWritten.set(0L)
        try {
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          ((System.nanoTime() - t0) / 1e9,
            graft.core.Barrier.reliableBytesWritten.get / 1e6)
        } finally {
          spark.conf.set("spark.graft.barrier", "auto")
          spark.conf.unset("spark.graft.barrier.everyK")
        }
      }
      run("local", 1) // warm codegen/scan cache so the A/B is barrier-only
      val l = math.min(run("local", 1)._1, run("local", 1)._1)
      val (f1, b1) = run("reliable", 1); val (f2, b2) = run("reliable", 1)
      val rFlat = math.min(f1, f2); val bFlat = math.max(b1, b2)
      val (k1, kb1) = run("reliable", 4); val (k2, kb2) = run("reliable", 4)
      val rK = math.min(k1, k2); val bK = math.max(kb1, kb2)
      println(f"$n%-26s $l%6.2f   $rFlat%6.2f  ${rFlat / l}%5.2fx   " +
        f"$rK%6.2f  ${rK / l}%5.2fx $bFlat%8.1f $bK%8.1f")
    }
    spark.stop()
  }
}

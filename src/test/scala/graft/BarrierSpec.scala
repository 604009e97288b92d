package graft

import graft.core.Barrier
import org.apache.spark.sql.functions._

/** The pluggable lineage barrier (graft.core.Barrier): mode selection,
  * and bit-identical results when an iterative operator runs over
  * reliable checkpoints instead of localCheckpoint.
  */
class BarrierSpec extends SparkSpec {

  private def withBarrier[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.barrier", mode)
    try body
    finally spark.conf.set("spark.graft.barrier", "auto")
  }

  test("mode selection: auto=local on a local master; flags override") {
    assert(!Barrier.useReliable(spark)) // auto + local[4,2]
    withBarrier("reliable")(assert(Barrier.useReliable(spark)))
    withBarrier("local")(assert(!Barrier.useReliable(spark)))
  }

  test("reliable barrier materializes files; free() reclaims them") {
    val df = withBarrier("reliable") {
      Barrier.checkpoint(spark.range(1000).toDF("id"))
    }
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.nonEmpty, "checkpoint dir should have been auto-set")
    val files = new java.io.File(new java.net.URI(dir.get)).listFiles()
    assert(files != null && files.nonEmpty, s"no checkpoint data in $dir")
    // the files back the data (readable after the persist was dropped)
    assert(df.agg(sum("id")).head.getLong(0) === 499500L)
    // free() = snapshot superseded: the files must be reclaimed, not
    // left to accumulate one copy per iterative round for the session
    val ckptFile = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getCheckpointFile
    }.flatten
    assert(ckptFile.nonEmpty, "reliable barrier should report its file")
    Barrier.free(df)
    ckptFile.foreach { p =>
      assert(!new java.io.File(new java.net.URI(p)).exists(),
        s"checkpoint files not reclaimed: $p")
    }
  }

  test("free() fails loudly on a frame derived from several barriers") {
    val a = Barrier.checkpoint(spark.range(10).toDF("x"))
    val b = Barrier.checkpoint(spark.range(10).toDF("x"))
    val joined = a.join(b, "x")
    intercept[IllegalArgumentException](Barrier.free(joined))
    // the mis-call corrupted nothing: both inputs still read
    assert(a.count() === 10 && b.count() === 10)
    Barrier.free(a); Barrier.free(b)
  }

  test("RoundBarrier: every-k checkpoints, recovery after block loss") {
    withBarrier("reliable") {
      spark.conf.set("spark.graft.barrier.everyK", "3")
      try {
        // scope the simulated loss to THIS chain's blocks: the session
        // is shared across suites, and unpersisting an unrelated LOCAL
        // checkpoint would destroy it (truncated lineage cannot
        // recompute)
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val rb = new graft.core.RoundBarrier(spark)
        var df = rb.next(spark.range(100).toDF("v")) // n=1: persisted
        for (_ <- 1 to 4) // n=2..5: checkpoint at n=3, 4-5 persisted
          df = rb.next(df.withColumn("v", col("v") + 1))
        // between-checkpoint rounds carry no files, only blocks: after
        // 5 calls exactly ONE live checkpoint must exist (the k-th)
        val dir = new java.io.File(
          new java.net.URI(spark.sparkContext.getCheckpointDir.get))
        def ckptFiles() = {
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
            else Seq(f)
          walk(dir).filter(_.getName.startsWith("part-"))
        }
        assert(ckptFiles().nonEmpty, "no checkpoint files at the k-th round")
        // SIMULATED EXECUTOR LOSS: drop every persisted block in the
        // session. The tail rounds (n=4,5) must RECOMPUTE through their
        // kept lineage from the k-th checkpoint's files
        // (0..99 plus four +1 rounds = 4..103, sum 5350).
        spark.sparkContext.getPersistentRDDs
          .collect { case (id, rdd) if !preexisting(id) => rdd }
          .foreach(_.unpersist(blocking = true))
        assert(df.agg(sum("v")).head.getLong(0) === 5350L)
        // seal the persisted tail: the escaping frame becomes a
        // barrier root and the superseded k-th checkpoint is freed
        val rooted = rb.seal(df)
        val leaves = rooted.queryExecution.analyzed.collectLeaves()
        assert(leaves.size == 1 &&
          leaves.head.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
        assert(rooted.agg(sum("v")).head.getLong(0) === 5350L)
        Barrier.free(rooted)
        assert(ckptFiles().isEmpty,
          "final free() must leave the checkpoint dir empty")
      } finally spark.conf.unset("spark.graft.barrier.everyK")
    }
  }

  test("RoundBarrier: seal() between checkpoints yields a freeable root") {
    withBarrier("reliable") {
      spark.conf.set("spark.graft.barrier.everyK", "4")
      try {
        val rb = new graft.core.RoundBarrier(spark)
        var df = spark.range(50).toDF("v")
        for (_ <- 1 to 2) df = rb.next(df.withColumn("v", col("v") + 1))
        val rooted = rb.seal(df.select(col("v") * 2 as "v")) // projection in
        val leaves = rooted.queryExecution.analyzed.collectLeaves()
        assert(leaves.size == 1 &&
          leaves.head.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
        assert(rooted.agg(sum("v")).head.getLong(0) === (2L to 51L).map(_ * 2).sum)
        Barrier.free(rooted)
      } finally spark.conf.unset("spark.graft.barrier.everyK")
    }
  }

  test("RoundBarrier: a loop that skips seal() is visibly leaked; " +
    "seal() clears it; library loops report clean") {
    withBarrier("reliable") {
      spark.conf.set("spark.graft.barrier.everyK", "4")
      try {
        // forgetful loop: 2 rounds (< k), no seal — in-between rounds
        // stay persisted and the registry must name this loop
        val bad = new graft.core.RoundBarrier(spark)
        var df = spark.range(20).toDF("v")
        for (_ <- 1 to 2) df = bad.next(df.withColumn("v", col("v") + 1))
        val leakedNow = graft.core.RoundBarrier.leaked
        assert(leakedNow.exists(_.contains("BarrierSpec")),
          s"unsealed loop not reported; got: $leakedNow")
        // and the escaping frame fails free() with a message naming seal()
        val e = intercept[IllegalArgumentException](Barrier.free(df))
        assert(e.getMessage.contains("seal"))
        // sealing retroactively clears the leak and yields a freeable root
        val rooted = bad.seal(df)
        assert(!graft.core.RoundBarrier.leaked.exists(_.contains("BarrierSpec")))
        Barrier.free(rooted)
        // a REAL library loop (min-label via q_dedup_clusters) leaves
        // nothing leaked — the loops the library ships all seal
        SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count()
        assert(!graft.core.RoundBarrier.leaked.exists(_.contains("ops.GraphOps")),
          s"library loop leaked: ${graft.core.RoundBarrier.leaked}")
      } finally spark.conf.unset("spark.graft.barrier.everyK")
    }
  }

  test("reliable mode leaves no checkpoint files once results are freed") {
    // an end-to-end iterative op: pageRankScaled frees every internal
    // snapshot itself; after freeing the RETURNED frame the session's
    // checkpoint dir must hold nothing new (verdict: a filling
    // checkpoint dir must be impossible in a well-behaved pipeline)
    import spark.implicits._
    def ckptFiles(): Set[String] =
      spark.sparkContext.getCheckpointDir.map { d =>
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(new java.net.URI(d)))
          .map(_.getPath).filter(_.contains("part-")).toSet
      }.getOrElse(Set.empty)
    val before = ckptFiles()
    val out = withBarrier("reliable") {
      val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 2L))
        .toDF("src", "dst", "w")
      val r = graft.ops.GraphOps.pageRankScaled(edges, iters = 5)
      r.count()
      r
    }
    Barrier.free(out)
    val leaked = ckptFiles() -- before
    assert(leaked.isEmpty, s"leaked checkpoint files: $leaked")
  }

  test("iterative op over the reliable path: identical checksums") {
    // q_dedup_clusters drives minLabelPropagation (the shared iterative
    // loop behind dup clusters and entity fusion) through many barriers
    // per round; the reliable path must be a pure swap.
    val q = SparkEntry.queries("q_dedup_clusters")
    def checksum(df: org.apache.spark.sql.DataFrame): Long = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
    }
    val local = checksum(q(spark, sfDir))
    val reliable = withBarrier("reliable")(checksum(q(spark, sfDir)))
    assert(local === reliable)
  }
}

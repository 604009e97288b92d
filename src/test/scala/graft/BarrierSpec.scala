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

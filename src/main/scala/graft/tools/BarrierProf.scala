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
  def main(args: Array[String]): Unit = {
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

package graft.tools

import graft.core.Barrier.BarrierOps
import graft.core.{Graft, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Phase-level profiler for dupClusters (dev tool; run with
  * `runMain graft.tools.ClusterProf [sfDir]`). Breaks the operator
  * into its phases so a regression can be attributed: candidate-pair
  * generation, edge materialization, and the propagation loop.
  */
object ClusterProf {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("cluster-prof", "local[32]")
    spark.conf.set("spark.graft.memoize", "false")
    val d = Tables.load(spark, sfDir, "documents")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(d.count())
    time("jaccard t=0.5 count")(Dedup.jaccardPairs(d, 0.5).count())
    time("jaccard t=0.5 again")(Dedup.jaccardPairs(d, 0.5).count())
    time("jaccard t=0.9 count")(Dedup.jaccardPairs(d, 0.9).count())
    time("jaccard t=0.9 again")(Dedup.jaccardPairs(d, 0.9).count())
    time("jaccard t=0.9 nosalt")(Dedup.jaccardPairs(d, 0.9, -1).count())
    val pairs = Dedup.jaccardPairs(d, 0.9).select("doc_a", "doc_b")
    val edgesRaw = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    time("edges union+repart+ckpt")(
      edgesRaw.repartition(col("src")).barrier().count())
    time("dupClusters full")(Dedup.dupClusters(d).count())
    time("dupClusters full again")(Dedup.dupClusters(d).count())
    spark.stop()
  }
}

package graft.tools

import graft.core.{Graft, Tables}
import graft.llm.Dedup

/** Micro-profiler for the dedup operators (dev tool; run with
  * `runMain graft.tools.DedupProf [sfDir]`).
  */
object DedupProf {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("dedup-prof", "local[32]")
    val d = Tables.load(spark, sfDir, "documents")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$r")
    }
    time("warmup")(d.count())
    time("jaccard_pairs")(Dedup.jaccardPairs(d).count())
    // steady-state salting sweep (first run above pays JIT/codegen)
    time("jaccard_unsalted")(Dedup.jaccardPairs(d, 0.5, -1).count())
    time("jaccard_salt_512")(Dedup.jaccardPairs(d, 0.5, 512).count())
    time("shingle_default")(Dedup.jaccardShinglePairs(d).count())
    time("shingle_unsalted")(Dedup.jaccardShinglePairs(d, saltTarget = -1).count())
    time("jaccard_pairs_t09")(Dedup.jaccardPairs(d, 0.9).count())
    time("edit_pairs")(Dedup.editVerifiedPairs(d).count())
    time("prefix_dups")(Dedup.prefixDups(d).count())
    time("minhash_sigs")(Dedup.minhashSignatures(d).count())
    time("minhash_pairs")(Dedup.minhashPairs(d).count())
    time("simhash")(Dedup.simhash(d).count())
    time("simhash_pairs")(Dedup.simhashPairs(d).count())
    time("simhash_pairs_banded")(Dedup.simhashPairsBanded(d).count())
    time("dup_clusters")(Dedup.dupClusters(d).count())
    time("url_dedup")(graft.llm.Curation.urlDedup(d).count())
    spark.stop()
  }
}

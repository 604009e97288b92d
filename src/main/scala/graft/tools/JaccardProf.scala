package graft.tools

import graft.core.{Graft, Tables}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the prefix-rank jaccard join (dev tool):
  * separates the rank-assignment machinery (tokenize / df / zipWithIndex
  * / ranks-per-doc) from the candidate join so optimization lands where
  * the time is. Usage: runMain graft.tools.JaccardProf [sfDir]
  */
object JaccardProf {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("jaccard-prof", "local[32]")
    import spark.implicits._
    val d = Tables.load(spark, sfDir, "documents")
    import graft.functions.text.hashed_sorted_tokens
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(d.count())
    // JIT/codegen warm for the full operator
    time("jaccard t=0.9 (cold)")(graft.llm.Dedup.jaccardPairs(d, 0.9).count())
    time("jaccard t=0.9 (warm)")(graft.llm.Dedup.jaccardPairs(d, 0.9).count())

    val base = graft.core.Layout.spread(d, "doc_id")
      .select(col("doc_id"), hashed_sorted_tokens(col("text")).as("toks"))
    val ex = base.select(col("doc_id"), explode(col("toks")).as("tok"))
    time("tokenize+explode count")(ex.count())
    val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    time("dfreq agg")(dfreq.count())
    val ranked = dfreq
      .repartitionByRange(col("df"), col("tok"))
      .sortWithinPartitions("df", "tok")
      .select("tok").rdd
      .zipWithIndex()
      .map { case (r, i) => (r.getLong(0), i) }
      .toDF("tok", "rank")
    time("rank zipWithIndex")(ranked.count())
    val ranksPerDoc = ex.join(ranked, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("rank"))).as("ranks"))
    time("ranksPerDoc")(ranksPerDoc.count())
    spark.stop()
  }
}

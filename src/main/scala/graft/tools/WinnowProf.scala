package graft.tools

import graft.core.Barrier.BarrierOps
import graft.core.{Graft, Tables}

/** Dev profiler for the winnow family. */
object WinnowProf {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session("winnow-prof", "local[32]")
    val d = Tables.load(spark, sfDir, "documents")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(d.count())
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.vector.{sorted_first_common, sorted_jaccard}
      val sets = graft.llm.TextOps.winnowSets(d, 4, 5)
        .select(col("doc_id"), col("selected")).barrier()
      val ex = sets.select(col("doc_id"), col("selected"),
        explode(col("selected")).as("h"))
      time("ex.count")(ex.count())
      def join(cond: org.apache.spark.sql.Column) =
        ex.as("a").join(ex.as("b").hint("merge"), cond).count()
      time("join keys only")(join(
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")))
      time("join + first_common")(join(
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.h") === sorted_first_common(col("a.selected"),
            col("b.selected"))))
      time("join + jaccard")(join(
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.h") === sorted_first_common(col("a.selected"),
            col("b.selected")) &&
          sorted_jaccard(col("a.selected"), col("b.selected")) >= lit(0.2)))
      val mirror =
        ex.as("a").join(ex.as("b").hint("merge"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
              col("a.h") === sorted_first_common(col("a.selected"),
                col("b.selected")) &&
              sorted_jaccard(col("a.selected"), col("b.selected")) >= lit(0.2))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            round(sorted_jaccard(col("a.selected"), col("b.selected")), 6)
              .as("w_jaccard"))
      time("join + jaccard + project")(mirror.count())
      val real = graft.llm.TextOps.winnowPairs(d)
      println("=== mirror optimized ===")
      println(mirror.queryExecution.optimizedPlan.treeString.take(4000))
      println("=== real optimized ===")
      println(real.queryExecution.optimizedPlan.treeString.take(4000))
    }
    time("winnowSets")(graft.llm.TextOps.winnowSets(d, 4, 5).count())
    time("winnowSets again")(graft.llm.TextOps.winnowSets(d, 4, 5).count())
    time("winnow digest")(graft.llm.TextOps.winnow(d).count())
    time("winnowPairs")(graft.llm.TextOps.winnowPairs(d).count())
    time("winnowPairs again")(graft.llm.TextOps.winnowPairs(d).count())
    spark.stop()
  }
}

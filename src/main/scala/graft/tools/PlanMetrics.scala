package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev profiler: execute a query, then print the FINAL adaptive plan
  * tree with each node's SQL metrics (output rows, codegen duration,
  * shuffle records) — maps JobProf's anonymous hot stages back to
  * operators. Usage: runMain graft.tools.PlanMetrics <sfDir> q_name
  */
object PlanMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_retrieval_rm3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.conf.set("spark.graft.memoize", "false")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    def dump(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("numOutputRows") || k.contains("duration") ||
          k.contains("Time") || k.contains("records") || k.contains("dataSize"))
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println("  " * depth + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => dump(a.executedPlan, depth + 1)
        case q: QueryStageExec => dump(q.plan, depth + 1)
        case _ => p.children.foreach(dump(_, depth + 1))
      }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.count()
      println(f"== $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      dump(df.queryExecution.executedPlan, 1)
    }
    spark.stop()
  }
}

package graft.tools

import graft.core.{Graft, Tables}
import graft.llm.{Pipeline, Sampling}
import org.apache.spark.sql.functions._

/** End-to-end curation CLI: documents -> dedup + quality gate ->
  * train/val/test split -> parquet partitioned by split.
  *
  * Usage: runMain graft.tools.CurateMain <sfDir> <outDir>
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: CurateMain <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val spark = Graft.session("graft-curate")
    try {
      val docs = Tables.load(spark, sfDir, "documents")
      val curated = Pipeline.curate(docs)
        .join(Sampling.trainTestSplit(docs), "doc_id")
      curated.write.mode("overwrite").partitionBy("split").parquet(outDir)
      val stats = spark.read.parquet(outDir)
        .groupBy("split").agg(count(lit(1)).as("n"))
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      println(s"[curate] ${docs.count()} docs in -> " +
        s"${spark.read.parquet(outDir).count()} curated out " +
        s"(${stats.sorted.mkString(", ")}) at $outDir")
    } finally spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession


/** Dev mirror of [[graft.Verify]] for a SUBSET of queries: dumps each
  * named query's result parquet plus its oracle SQL entry so
  * `tools/check_oracle.py` can gate just the operator under iteration
  * instead of the full suite.
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> q_a q_b ...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    graft.Verify.writeManifests(outDir, names)
    spark.stop()
  }
}

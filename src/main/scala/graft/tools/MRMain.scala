package graft.tools

import graft.core.Graft
import graft.mr.{AssociativeMRJob, InvertedIndexFast, MRApps, MRJob, WordCountFast}

/** CLI entry mirroring the reference's worker binary
  * (`main/mrworker.go`): pick an app by name, run it over input files,
  * write `key value` text output.
  *
  * Usage: runMain graft.tools.MRMain [--fast] <app> <outDir> <inputPath...>
  *
  * `--fast` selects the associative Aggregator path (map-side partial
  * aggregation) for apps that support it (wc, indexer).
  */
object MRMain {
  def main(rawArgs: Array[String]): Unit = {
    val fast = rawArgs.headOption.contains("--fast")
    val args = if (fast) rawArgs.drop(1) else rawArgs
    if (args.length < 3) {
      System.err.println(
        s"usage: MRMain [--fast] <app> <outDir> <inputPath...>  " +
          s"(apps: ${MRApps.registry.keys.toSeq.sorted.mkString(",")}; " +
          s"--fast supports: wc,indexer)")
      sys.exit(2)
    }
    val Array(appName, outDir) = args.take(2)
    val paths = args.drop(2).toSeq
    val spark = Graft.session(appName = s"graft-mr-$appName")
    try {
      val result =
        if (fast) appName match {
          case "wc" => AssociativeMRJob.run(spark, WordCountFast, paths)
          case "indexer" => AssociativeMRJob.run(spark, InvertedIndexFast, paths)
          case other =>
            System.err.println(s"--fast unsupported for '$other'"); sys.exit(2)
        }
        else MRJob.run(spark, MRApps.byName(appName), paths)
      MRJob.writeText(result, outDir)
      println(s"[mrmain] wrote ${result.count()} keys to $outDir" +
        (if (fast) " (associative fast path)" else ""))
    } finally spark.stop()
  }
}

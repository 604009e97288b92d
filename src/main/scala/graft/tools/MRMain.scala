package graft.tools

import graft.core.Graft
import graft.mr.{MRApps, MRJob}

/** CLI entry mirroring the reference's worker binary
  * (`main/mrworker.go`): pick an app by name, run it over input files,
  * write `key value` text output.
  *
  * Usage: runMain graft.tools.MRMain <app> <outDir> <inputPath...>
  */
object MRMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        s"usage: MRMain <app> <outDir> <inputPath...>  " +
          s"(apps: ${MRApps.registry.keys.toSeq.sorted.mkString(",")})")
      sys.exit(2)
    }
    val Array(appName, outDir) = args.take(2)
    val app = MRApps.byName(appName)
    val spark = Graft.session(appName = s"graft-mr-$appName")
    try {
      val result = MRJob.run(spark, app, args.drop(2).toSeq)
      MRJob.writeText(result, outDir)
      println(s"[mrmain] wrote ${result.count()} keys to $outDir")
    } finally spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Dev scratch: print the build-side subtree of every BNL that
  * [[PlanAudit.tinyBuildReason]] refuses to bless, for the named
  * queries (or all).
  */
object BnlDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    val spark = Graft.session("bnl-debug", "local[4]")
    names.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      PlanAudit.bnlBuildSides(qe.executedPlan).foreach { b =>
        PlanAudit.tinyBuildReason(b) match {
          case Some(r) => println(s"== $name OK ($r)")
          case None =>
            println(s"== $name UNBOUNDED:\n${b.treeString.linesIterator.take(12).mkString("\n")}")
        }
      }
    }
    spark.stop()
  }
}

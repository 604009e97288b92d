package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler: per-JOB breakdown of a query's execution — wall time,
  * stage/task counts and summed task time per Spark job, plus the job
  * count itself. Iterative operators at bench scale (sf0.1) are
  * dominated by per-round fixed costs (job scheduling, AQE replanning,
  * localCheckpoint materialization), and the job ledger is how that
  * shows: a 3 s query with 60 jobs of 40 ms median is round-overhead-
  * bound, not compute-bound. Usage:
  *   runMain graft.tools.JobProf <sfDir> q_a q_b ...
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_clusters")
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

    case class Job(id: Int, t0: Long, var t1: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   var taskMs: Long = 0L)
    case class Stg(id: Int, name: String, var tasks: Int = 0,
                   var taskMs: Long = 0L, var maxMs: Long = 0L,
                   var srRec: Long = 0L, var swRec: Long = 0L,
                   var outRows: Long = 0L, var inRec: Long = 0L,
                   var site: String = "")
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    val stages = new scala.collection.mutable.LinkedHashMap[Int, Stg]
    val stageToJob = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        jobs(e.jobId) = Job(e.jobId, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs(e.jobId).stages += e.stageIds.size
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        synchronized {
          stages(e.stageInfo.stageId) =
            Stg(e.stageInfo.stageId, e.stageInfo.name.take(60),
              site = e.stageInfo.details.linesIterator
                .find(l => l.contains("graft.") && !l.contains("tools."))
                .getOrElse("").trim.take(70))
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        for (j <- stageToJob.get(e.stageId); job <- jobs.get(j)) {
          job.tasks += 1
          if (e.taskInfo != null)
            job.taskMs += e.taskInfo.duration
        }
        for (s <- stages.get(e.stageId) if e.taskInfo != null) {
          s.tasks += 1; s.taskMs += e.taskInfo.duration
          s.maxMs = s.maxMs.max(e.taskInfo.duration)
          if (e.taskMetrics != null) {
            s.srRec += e.taskMetrics.shuffleReadMetrics.recordsRead
            s.swRec += e.taskMetrics.shuffleWriteMetrics.recordsWritten
            s.outRows += e.taskMetrics.outputMetrics.recordsWritten
            s.inRec += e.taskMetrics.inputMetrics.recordsRead
          }
        }
      }
    }

    // absorb startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    try {
      import spark.implicits._
      val tiny = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
      graft.llm.Dedup.jaccardPairs(tiny, 0.9).count()
    } catch { case _: Throwable => }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm once so codegen/JIT don't pollute the ledger
      fn(spark, sfDir).count()
      jobs.clear(); stages.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener bus (private API — a short sleep suffices here)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.values.toSeq
      val jobWall = js.map(j => (j.t1 - j.t0).max(0L)).sum / 1e3
      println(f"== $n: wall $wall%.3f s, ${js.size} jobs, " +
        f"sum-job-wall $jobWall%.3f s, gap ${wall - jobWall}%.3f s")
      js.foreach { j =>
        println(f"  job ${j.id}%4d  ${(j.t1 - j.t0).max(0L)}%6d ms  " +
          f"stages ${j.stages}%3d  tasks ${j.tasks}%5d  taskSum ${j.taskMs}%7d ms")
      }
      println("  -- stages by task time --")
      stages.values.toSeq.sortBy(-_.taskMs).take(12).foreach { s =>
        println(f"  stage ${s.id}%4d tasks ${s.tasks}%4d sum ${s.taskMs}%7d " +
          f"max ${s.maxMs}%6d ms  in ${s.inRec}%9d  sr ${s.srRec}%9d  " +
          f"sw ${s.swRec}%9d  ${s.site}")
      }
    }
    spark.stop()
  }
}

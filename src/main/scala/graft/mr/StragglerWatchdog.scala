package graft.mr

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd, SparkListenerTaskStart}

/** Straggler requeue — the Spark-native analog of the reference
  * coordinator's 10-second task timeout (mr/coordinator.go:208-266): a
  * task attempt that runs longer than `timeoutMs` is KILLED (killed
  * attempts do not count toward `spark.task.maxFailures`) and the
  * scheduler re-enqueues the partition, exactly as the reference hands
  * a timed-out map/reduce task to another worker.
  *
  * On a real multi-executor cluster `spark.speculation=true` covers the
  * same failure mode by launching a duplicate attempt instead of
  * killing the slow one — strictly better when the straggler is a slow
  * machine rather than a hung task, and the deployment default this
  * library recommends. Spark's scheduler hard-disables speculation in
  * local mode (`TaskSchedulerImpl.start` gates the speculation thread
  * on `!isLocal`), so the watchdog is also what makes straggler-requeue
  * behavior locally testable (BehavioralSpec).
  *
  * Exactly-once is unaffected: a killed attempt's partial output is
  * discarded by Spark's task-commit protocol, so the retried attempt's
  * result is the only one observed — asserted in BehavioralSpec.
  */
final class StragglerWatchdog(
    sc: SparkContext,
    timeoutMs: Long = 10000L, // the reference coordinator's 10 s
    checkIntervalMs: Long = 500L,
    maxKillsPerTask: Int = 3) extends SparkListener {

  private final case class Running(
      startedMs: Long, stageId: Int, partition: Int, refusedKills: Int = 0)
  private val running = TrieMap.empty[Long, Running]
  // (stage, partition) -> kills so far; a task that legitimately needs
  // longer than the timeout is left alone after `maxKillsPerTask`
  // attempts rather than starved forever
  private val kills = TrieMap.empty[(Int, Int), Int]
  @volatile private var killedTotal = 0L
  private var timer: ScheduledExecutorService = _

  override def onTaskStart(t: SparkListenerTaskStart): Unit =
    running.put(t.taskInfo.taskId,
      Running(System.currentTimeMillis(), t.stageId, t.taskInfo.index))

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    running.remove(t.taskInfo.taskId)

  // A stage's (stage, partition) kill budget is only meaningful while
  // the stage runs; without pruning, a long-lived session's `kills` map
  // grows one entry per killed partition forever.
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
    val sid = s.stageInfo.stageId
    kills.keySet.filter(_._1 == sid).foreach(kills.remove)
  }

  /** Attempts killed over this watchdog's lifetime. */
  def totalKills: Long = killedTotal

  // Test hooks (BehavioralSpec): drive one scan pass synchronously and
  // inspect tracking state without depending on timer scheduling.
  private[graft] def scanOnce(): Unit = scan()
  private[graft] def isTracked(taskId: Long): Boolean = running.contains(taskId)
  private[graft] def killBudgetEntries: Int = kills.size

  def start(): this.type = {
    sc.addSparkListener(this)
    timer = Executors.newSingleThreadScheduledExecutor { r =>
      val th = new Thread(r, "graft-straggler-watchdog")
      th.setDaemon(true)
      th
    }
    timer.scheduleWithFixedDelay(() => scan(), checkIntervalMs,
      checkIntervalMs, TimeUnit.MILLISECONDS)
    this
  }

  def stop(): Unit = {
    if (timer != null) timer.shutdownNow()
    sc.removeSparkListener(this)
    running.clear()
  }

  private def scan(): Unit = {
    val now = System.currentTimeMillis()
    running.foreach { case (taskId, r) =>
      if (now - r.startedMs > timeoutMs) {
        val key = (r.stageId, r.partition)
        // drop from tracking first: if the attempt finished in the
        // meantime killTaskAttempt is a no-op, and we must not kill the
        // RETRY attempt on a stale timer (a retry is a NEW taskId, so
        // re-tracking this id below can never target the retry)
        running.remove(taskId)
        if (kills.getOrElse(key, 0) < maxKillsPerTask) {
          val killed =
            try sc.killTaskAttempt(taskId, interruptThread = true,
              reason = s"graft straggler watchdog: attempt exceeded ${timeoutMs}ms " +
                s"(stage ${r.stageId}, partition ${r.partition})")
            catch {
              // racing a finished/unknown attempt — treat as refused
              case _: Exception => false
            }
          if (killed) {
            kills.update(key, kills.getOrElse(key, 0) + 1)
            killedTotal += 1
          } else if (r.refusedKills + 1 < maxKillsPerTask) {
            // Refused kill (scheduler busy, transient race): re-track so
            // the next scan retries — otherwise a genuinely hung attempt
            // whose first kill fails is permanently untracked. Bounded:
            // an attempt that actually FINISHED between the remove above
            // and this put is dropped for good after maxKillsPerTask
            // refusals instead of being retried forever.
            running.putIfAbsent(taskId, r.copy(refusedKills = r.refusedKills + 1))
          }
        }
      }
    }
  }
}

package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Pluggable lineage barrier — the single indirection every iterative
  * operator in this library uses to truncate lineage between rounds
  * (graph propagation, contrastive pair reuse, classifier GD, ...).
  *
  * Why an indirection: `Dataset.localCheckpoint` truncates lineage but
  * stores the blocks ONLY on the executors that computed them, with no
  * lineage left to recompute from — on a real cluster, one executor
  * loss (or a dynamic-allocation decommission) after the truncation
  * makes the job unrecoverable. That is fine on `local[*]` (one JVM,
  * nothing to lose) and fatal at 1000 executors. This object picks the
  * barrier per deployment:
  *
  *   - `spark.graft.barrier=local`    → always `localCheckpoint` (fast,
  *     single-JVM only);
  *   - `spark.graft.barrier=reliable` → always a reliable
  *     `Dataset.checkpoint` (survives executor loss; requires a
  *     cluster-visible checkpoint dir);
  *   - `spark.graft.barrier=auto` (default) → `local` on a `local[*]`
  *     master, `reliable` everywhere else (including
  *     `local-cluster[...]`, whose executors are real separate
  *     processes).
  *
  * The reliable path persists (MEMORY_AND_DISK) before checkpointing so
  * the eager materialization and the checkpoint file write share one
  * computation of the plan, then drops the persisted copy — the
  * checkpoint files back the data from then on. The checkpoint dir
  * resolves, in order: an already-set `SparkContext.setCheckpointDir`;
  * the `spark.graft.checkpointDir` conf; on a same-machine master
  * (`local*`/`local-cluster*`) a tmpdir default. A remote cluster with
  * none of these fails loudly rather than writing checkpoints to a
  * driver-local path the executors can't see.
  *
  * One deliberate non-user of this object: the bench harness's io_calib
  * probe (`Bench.scala`) localCheckpoints to DISK_ONLY **because** it is
  * measuring local block-store I/O — routing it through here would
  * change what it measures.
  */
object Barrier {

  /** True when this session's barrier is the reliable checkpoint. */
  def useReliable(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.barrier", "auto") match {
      case "local"    => false
      case "reliable" => true
      case _ =>
        val m = spark.sparkContext.master
        !(m == "local" || m.startsWith("local["))
    }

  /** Truncate `ds`'s lineage with the deployment-appropriate barrier. */
  def checkpoint[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val spark = ds.sparkSession
    if (!useReliable(spark)) ds.localCheckpoint(eager)
    else {
      ensureCheckpointDir(spark)
      val persisted = ds.persist(StorageLevel.MEMORY_AND_DISK)
      val out = persisted.checkpoint(eager)
      if (eager) persisted.unpersist(blocking = false)
      out
    }
  }

  /** Eagerly drop a barrier's storage blocks. NOTE `Dataset.unpersist`
    * is a NO-OP for a checkpointed dataset: it only consults the
    * CacheManager, which never sees a checkpoint's backing RDD
    * (verified against Spark 4.1.2 — both checkpoint flavors persist /
    * materialize the internal RDD directly and wrap it in a
    * `LogicalRDD`). The blocks must be dropped on that RDD itself,
    * reached via the plan's leaf. For a reliable checkpoint the
    * unpersist is a harmless no-op (the data lives in checkpoint files,
    * cleaned by `spark.cleaner.referenceTracking.cleanCheckpoints` or
    * at application exit).
    */
  def free(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  private def ensureCheckpointDir(spark: SparkSession): Unit =
    synchronized {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val conf = spark.conf.get("spark.graft.checkpointDir", "")
        val sameMachine = sc.master == "local" ||
          sc.master.startsWith("local[") ||
          sc.master.startsWith("local-cluster[")
        val dir =
          if (conf.nonEmpty) conf
          else if (sameMachine)
            s"${sys.props("java.io.tmpdir")}/graft-ckpt-${sc.applicationId}"
          else
            throw new IllegalStateException(
              "Barrier: reliable checkpoints need a cluster-visible " +
                "checkpoint dir — set spark.graft.checkpointDir or call " +
                "SparkContext.setCheckpointDir before the first barrier.")
        sc.setCheckpointDir(dir)
      }
    }

  /** `ds.barrier()` chain syntax for the call sites. */
  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    def barrier(eager: Boolean = true): Dataset[T] =
      Barrier.checkpoint(ds, eager)
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  *
  * Measured cost of the reliable mode on the iterative family
  * (`graft.tools.BarrierProf`, sf0.1): 1.19–2.01x — one checkpoint
  * file write per round. The refinement when that dominates a profile
  * is the Pregel/GraphX discipline: persist (lineage KEPT, so executor
  * loss recomputes from the last checkpoint) on most rounds and
  * reliably checkpoint every k-th, bounding both the per-round write
  * cost and the worst-case recompute depth at k — implemented as
  * [[RoundBarrier]] below and used by the loops the profile flagged
  * (classifier GD 2.01x, PageRank 1.61x) plus the shared min-label
  * loop behind dup clusters / entity fusion. Loops with few rounds or
  * interleaved multi-frame chains (HITS' alternating hub/authority
  * pair, SSSP, k-core) keep the flat per-round barrier. One-shot
  * derived frames that every round READS but that recompute cheaply
  * from a durable source (feature tables, edge snapshots of a scan)
  * belong on [[scratch]], not on a durable checkpoint — only the
  * round-carrying CHAIN needs files, because only its recompute depth
  * grows with the round count.
  */
object Barrier {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Cumulative bytes of reliable-checkpoint files written by this
    * JVM — the load-insensitive cost metric the every-k discipline
    * moves (wall-clock A/Bs on local[*] mostly measure job-scheduling
    * overhead; at cluster scale the shared-store WRITE VOLUME is the
    * bill). Dev/profiling only (BarrierProf reports it); incremented
    * after each reliable checkpoint materializes.
    */
  private[graft] val reliableBytesWritten =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def recordCheckpointBytes(ds: Dataset[_]): Unit =
    try {
      val hconf = ds.sparkSession.sparkContext.hadoopConfiguration
      ds.queryExecution.analyzed.collectLeaves().foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.getCheckpointFile.foreach { p =>
            val path = new org.apache.hadoop.fs.Path(p)
            reliableBytesWritten.addAndGet(
              path.getFileSystem(hconf).getContentSummary(path).getLength)
          }
        case _ => ()
      }
      // NonFatal, not just IOException: this runs inline on the
      // production checkpoint path, and object-store FileSystem shims
      // may throw RuntimeExceptions (e.g. UnsupportedOperationException
      // from getContentSummary) — a dev-only byte counter must never
      // fail a real checkpoint
    } catch { case scala.util.control.NonFatal(_) => () }

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
      if (eager) {
        // persist so the eager materialization and the checkpoint file
        // write share one computation, then drop the persisted copy —
        // the files back the data from here on. A frame the CALLER
        // already persisted (RoundBarrier.seal) is left alone — its
        // owner unpersists it.
        val alreadyPersisted = ds.storageLevel != StorageLevel.NONE
        val persisted =
          if (alreadyPersisted) ds else ds.persist(StorageLevel.MEMORY_AND_DISK)
        val out = persisted.checkpoint(eager = true)
        if (!alreadyPersisted) persisted.unpersist(blocking = false)
        recordCheckpointBytes(out)
        out
      } else {
        // lazy: no persist — there is no safe point to drop it (the
        // checkpoint materializes at some future action); the first
        // action computes the plan twice (once for the job, once for
        // the checkpoint write), the standard RDD.checkpoint caveat
        ds.checkpoint(eager = false)
      }
    }
  }

  /** Eagerly reclaim a SUPERSEDED barrier's storage — the caller is
    * declaring the snapshot dead (iterative operators call this on
    * round N-1 once round N is materialized; the frame must not be
    * read again).
    *
    * Local path: NOTE `Dataset.unpersist` is a NO-OP for a
    * checkpointed dataset — it only consults the CacheManager, which
    * never sees a checkpoint's backing RDD (verified against Spark
    * 4.1.2 — both checkpoint flavors persist / materialize the
    * internal RDD directly and wrap it in a `LogicalRDD`). The blocks
    * must be dropped on that RDD itself, reached via the plan's leaf;
    * with the lineage truncated, the frame becomes unreadable.
    *
    * Reliable path: DELETES the checkpoint files — without this, a
    * long session's iterative operators would leave rounds-many full
    * dataset copies under the checkpoint dir (Spark only cleans them
    * via `spark.cleaner.referenceTracking.cleanCheckpoints`, off by
    * default and GC-timed); same snapshot-is-dead contract as the
    * local block drop.
    */
  def free(ds: Dataset[_]): Unit = {
    val hconf = ds.sparkSession.sparkContext.hadoopConfiguration
    // CONTRACT GUARD: the frame must be the barrier itself or a pure
    // derivation of exactly ONE barrier (select/drop wrappers are
    // fine). A frame built from SEVERAL barriered inputs would have
    // its inputs' blocks/files deleted while sibling frames still
    // read them — fail loudly instead of corrupting them.
    val leaves = ds.queryExecution.analyzed.collectLeaves()
    require(leaves.size == 1 &&
      leaves.head.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "Barrier.free: expected a frame backed by exactly one barrier " +
        s"(LogicalRDD leaf); got leaves ${leaves.map(_.nodeName)} — " +
        "free each barriered input individually, when IT is superseded")
    // CONTRACT GUARD 2: a frame backed by a RoundBarrier's UNSEALED
    // in-between round looks like a clean single-barrier root (the
    // plan truncation hides the loop), but freeing it would drop one
    // round's blocks while the loop's other persisted rounds stay
    // pinned and the recovery chain back to the last checkpoint is
    // severed. The loop must seal() its escaping frame first.
    leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        RoundBarrier.ownerOfRound(l.rdd.id).foreach { owner =>
          throw new IllegalArgumentException(
            s"Barrier.free: this frame is an UNSEALED in-between round " +
              s"of $owner — call RoundBarrier.seal(frame) on the frame " +
              "escaping the loop; seal makes it a single-barrier root " +
              "and reclaims the loop's persisted rounds.")
        }
    }
    leaves.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(hconf).delete(path, true)
          } catch {
            case e: java.io.IOException =>
              // best-effort, but never silent: a long-lived session
              // whose deletes keep failing is filling its checkpoint
              // dir, and this line is how that gets diagnosed
              log.warn(s"Barrier.free: could not delete checkpoint " +
                s"files at $p: ${e.getMessage}")
          }
        }
      case _ => ()
    }
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
        // the AUTO-CREATED default is ours to clean up: without this a
        // session that outlives its iterative ops leaks one tmpdir per
        // application (free() deletes superseded snapshots, but the
        // final barrier of every op legitimately keeps its files until
        // the app ends). User-provided dirs are never touched.
        if (conf.isEmpty && sameMachine) {
          val created = dir
          sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit =
              try {
                val p = new org.apache.hadoop.fs.Path(created)
                p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
              } catch {
                case ex: java.io.IOException =>
                  log.warn(s"Barrier: could not delete auto-created " +
                    s"checkpoint dir $created: ${ex.getMessage}")
              }
          })
        }
      }
    }

  /** Materialize a WITHIN-ROUND scratch frame that several consumers
    * of the SAME round read (e.g. classifier GD's per-doc error table
    * feeding both the loss row and the gradient). Local mode: a plain
    * localCheckpoint, as ever. Reliable mode: persist + eager count —
    * LINEAGE KEPT, so no checkpoint-file write is paid (the reliable
    * mode's single biggest per-round cost when the scratch frame is
    * corpus-sized); an executor loss just recomputes the lost blocks
    * from the round's checkpointed inputs. Reclaim with
    * [[freeScratch]] once the round's outputs are materialized.
    */
  def scratch[T](ds: Dataset[T]): Dataset[T] =
    if (!useReliable(ds.sparkSession)) ds.localCheckpoint(eager = true)
    else {
      val out = ds.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    }

  /** Reclaim a [[scratch]] frame (it must not be read again). */
  def freeScratch(ds: Dataset[_]): Unit =
    if (!useReliable(ds.sparkSession)) free(ds)
    else ds.unpersist(blocking = false)

  /** `ds.barrier()` chain syntax for the call sites. */
  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    def barrier(eager: Boolean = true): Dataset[T] =
      Barrier.checkpoint(ds, eager)
  }
}

/** Pregel-style CHECKPOINT-EVERY-K round barrier for an iterative
  * loop's round-carrying state — the refinement of [[Barrier]] for
  * loops where a reliable checkpoint write per round dominates
  * (BarrierProf measured 2.01x on classifier GD, 1.61x on PageRank).
  *
  * One instance per loop, one [[next]] call per round on the frame
  * that carries state into the following round, one [[seal]] on the
  * frame that escapes the loop. Per deployment:
  *
  *   - LOCAL barrier mode: [[next]] is exactly the flat discipline the
  *     loops used before — `localCheckpoint(eager)` + eagerly free the
  *     superseded previous round's blocks. Zero behavior change on
  *     `local[*]`.
  *   - RELIABLE mode: every k-th round writes a reliable checkpoint
  *     (then frees the previous checkpoint's files and unpersists the
  *     in-between rounds); the other rounds persist MEMORY_AND_DISK
  *     with LINEAGE KEPT and materialize eagerly. An executor loss on
  *     a persisted round recomputes from the last checkpoint — at most
  *     k-1 rounds of recompute, the Pregel/GraphX trade: k bounds the
  *     recovery depth, 1/k bounds the checkpoint-write amortization.
  *
  * [[seal]] makes the escaping frame a BARRIER ROOT in both modes
  * (checkpointing it if the loop ended between checkpoints), so every
  * caller invariant downstream — `Barrier.free` on the result, plans
  * that never grow past one round — holds exactly as under the flat
  * discipline.
  *
  * `k` resolves from `spark.graft.barrier.everyK` when set, else the
  * constructor's family-tuned `defaultK` (4). k=1 degenerates to the
  * flat reliable barrier.
  *
  * THE k TRADE IS CALL-SITE-SHAPED (BarrierProf `sweep` at 50-round GD
  * / 20-iter PageRank, BASELINE.md round-18 row): an EAGER loop over a
  * tiny chain frame improves monotonically with k (classifier GD r50:
  * 47.9 s at k=1 → 30.3 s at k=16 — per-checkpoint fixed cost is the
  * whole trade), while a LAZY (eager=false) shuffle-heavy chain
  * degrades monotonically (pagerank i20: 6.9 s at k=1 → 32.6 s at
  * k=16 — the k-segment computes as ONE job whose plan carries 2k
  * shuffles, and AQE replanning over that chain is super-linear in k).
  * k=4 is the compromise default for unknown loops;
  * `spark.graft.barrier.eagerRounds=true` converts lazy call sites to
  * per-round jobs when a deployment raises k.
  */
final class RoundBarrier(spark: SparkSession, defaultK: Int = 4) {
  private val reliable = Barrier.useReliable(spark)
  // `defaultK` is the call site's family-tuned k (the BarrierProf sweep
  // is per-family: a tiny eager chain frame wants large k — classifier
  // GD measured 41.3 s at k=4 vs 30.3 s at k=16 over 50 rounds, the
  // per-checkpoint fixed cost being the whole trade — while shuffle-
  // heavy rounds are flat-in-k once eager). The conf, when SET,
  // overrides every call site: one deployment-wide recovery-depth cap.
  private val k: Int =
    spark.conf.getOption("spark.graft.barrier.everyK")
      .map(_.toInt).getOrElse(defaultK) max 1
  private var n = 0
  private var lastCkpt: Option[Dataset[_]] = None
  private var lastWasCkpt = false
  private val persisted =
    scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  // where this loop was constructed — names the culprit in a leak report
  private val site: String =
    Thread.currentThread.getStackTrace
      .find(e => e.getClassName.startsWith("graft.") &&
        !e.getClassName.startsWith("graft.core."))
      .map(e => s"${e.getClassName}.${e.getMethodName}(${e.getFileName}:${e.getLineNumber})")
      .getOrElse("<unknown call site>")
  RoundBarrier.track(this, spark)

  /** True iff this loop still holds live persisted in-between rounds —
    * i.e. it produced at least one non-checkpoint round and neither a
    * k-th-round checkpoint nor [[seal]] has reclaimed them. A completed
    * loop in this state leaked: its escaping frame is a multi-input
    * plan `Barrier.free` will reject, and the persisted rounds pin
    * executor storage for the app's lifetime.
    */
  private[graft] def holdsUnsealedRounds: Boolean =
    synchronized(persisted.nonEmpty)
  private[graft] def describe: String =
    s"RoundBarrier from $site (rounds=$n, live persisted=${persisted.size})"

  // RDD ids of the truncated in-between rounds this loop has handed
  // out and not yet superseded — the key Barrier.free's misuse guard
  // looks up (see registerRoundId/ownerOfRound)
  private val roundIds = scala.collection.mutable.Set.empty[Int]
  private def registerRoundId(out: DataFrame): Unit =
    out.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        roundIds += l.rdd.id
        RoundBarrier.claimRound(l.rdd.id, this)
      case _ => ()
    }
  private def releaseRoundIds(): Unit = {
    roundIds.foreach(RoundBarrier.releaseRound)
    roundIds.clear()
  }

  /** Barrier round `n`'s state frame. Frees / unpersists superseded
    * rounds per the mode's discipline; never touches frames it did
    * not itself return.
    *
    * `eager` (default true) materializes each non-checkpoint round
    * with its own job — required when the loop body feeds a round
    * into SEVERAL consumers (an unmaterialized plan could recompute
    * per consumer; racing stages can even compute a lazily-persisted
    * frame twice). A loop whose round feeds exactly ONE downstream
    * plan MAY pass eager=false: the in-between rounds persist lazily
    * and the k-th round's checkpoint job computes the whole k-segment
    * in ONE pass. MEASURED CAUTION (BarrierProf sweep, 20-iter
    * pagerank): that one-pass job's plan carries every shuffle of the
    * segment, and its cost grows SUPER-linearly in k (6.9 s at k=1 →
    * 32.6 s at k=16 vs a flat 6.6-9.0 s eager) — AQE replans the
    * whole 2k-shuffle chain stage by stage. Lazy only breaks even at
    * k <= 2; prefer eager for shuffle-bearing rounds. Local mode is
    * always eager (the free-previous discipline needs the new round
    * materialized first).
    */
  def next(ds: DataFrame, eager: Boolean = true): DataFrame = {
    // `spark.graft.barrier.eagerRounds=true` overrides a call site's
    // eager=false: materialize every in-between round with its own job
    // even on a linear chain. The k-sweep showed the one-pass k-segment
    // job super-linear in k on shuffle-heavy rounds (deep AQE plans);
    // this knob lets a deployment (and BarrierProf) choose per-job
    // depth 1 without touching call sites.
    val eag = eager ||
      spark.conf.get("spark.graft.barrier.eagerRounds", "false").toBoolean
    n += 1
    if (!reliable) {
      val out = ds.localCheckpoint(eager = true)
      lastCkpt.foreach(Barrier.free)
      lastCkpt = Some(out)
      out
    } else if (n % k == 0) {
      val out = Barrier.checkpoint(ds, eager = true)
      // the new checkpoint's files back everything from here on: the
      // in-between persisted rounds and the previous checkpoint are
      // no longer part of any future plan or recovery chain
      persisted.foreach(_.unpersist(blocking = false)); persisted.clear()
      releaseRoundIds()
      lastCkpt.foreach(Barrier.free)
      lastCkpt = Some(out); lastWasCkpt = true
      out
    } else {
      val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
      if (eag) p.count()
      persisted += p
      lastWasCkpt = false
      // TRUNCATE the logical plan (LogicalRDD over the cached physical
      // RDD): a loop whose round references itself twice (pointer-jump
      // self-joins, model-in-two-places GD) would otherwise DOUBLE its
      // analyzed-plan subtree every round — persist caches data but
      // does not stop Catalyst from re-analyzing the whole history
      // (measured: every-k WORSE than flat until this wrap). Recovery
      // still walks the intact RDD lineage through the cache back to
      // the last checkpoint.
      val out = org.apache.spark.sql.graftbridge.Bridge.truncatePlan(p)
      // register the truncated round's backing RDD so a misuse —
      // Barrier.free on an UNSEALED escaping frame — is rejected with
      // a message naming seal() instead of silently severing the
      // loop's recovery chain (the truncation makes such a frame look
      // like a clean single-barrier root)
      registerRoundId(out)
      out
    }
  }

  /** Seal the frame escaping the loop (the value of the LAST [[next]]
    * call, possibly re-projected). Identity in local mode and when the
    * final round landed on a checkpoint; otherwise checkpoints it
    * reliably and reclaims the now-superseded tail. The result is
    * always a single-barrier frame.
    */
  def seal(ds: DataFrame): DataFrame =
    if (!reliable || lastWasCkpt) ds
    else {
      val out = Barrier.checkpoint(ds, eager = true)
      persisted.foreach(_.unpersist(blocking = false)); persisted.clear()
      releaseRoundIds()
      lastCkpt.foreach(Barrier.free)
      lastCkpt = Some(out); lastWasCkpt = true
      out
    }
}

/** Leak visibility for [[RoundBarrier]]'s caller contract (`seal()` the
  * escaping frame): every instance self-registers here (weak refs — a
  * collected loop holds nothing), and [[leaked]] reports the live ones
  * still holding persisted in-between rounds. Wired two ways:
  *
  *   - at application end, a once-per-context listener WARN-logs each
  *     leaked loop with its construction site — so a forgotten seal()
  *     is named in the driver log BEFORE anyone debugs the downstream
  *     `Barrier.free` rejection on a cluster;
  *   - specs/debug code call [[leaked]] directly and assert empty.
  *
  * Never throws: misuse detection must not fail a job that would
  * otherwise finish.
  */
object RoundBarrier {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val live = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[RoundBarrier, java.lang.Boolean]())
  private val listenerInstalled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def track(rb: RoundBarrier, spark: SparkSession): Unit = {
    live.put(rb, java.lang.Boolean.TRUE)
    val sc = spark.sparkContext
    if (listenerInstalled.add(sc.applicationId)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          leaked.foreach(d => log.warn(
            s"RoundBarrier leak at application end: $d — the loop never " +
              "called seal() on its escaping frame; downstream " +
              "Barrier.free will reject it and the persisted rounds " +
              "pinned storage for the app's lifetime."))
      })
    }
  }

  /** Descriptions of live loops still holding unsealed persisted
    * rounds (empty when every loop sealed or checkpoint-aligned).
    */
  def leaked: Seq[String] = {
    val snapshot = live.synchronized {
      import scala.jdk.CollectionConverters._
      live.keySet.asScala.toList
    }
    snapshot.filter(_.holdsUnsealedRounds).map(_.describe)
  }

  // in-between-round RDD id -> owning loop, for Barrier.free's misuse
  // guard; entries live only between a round's persist and its
  // supersession (k-th checkpoint or seal), so the map stays tiny
  private val roundOwners =
    new java.util.concurrent.ConcurrentHashMap[Int, RoundBarrier]()
  private def claimRound(id: Int, rb: RoundBarrier): Unit =
    roundOwners.put(id, rb)
  private def releaseRound(id: Int): Unit = roundOwners.remove(id)
  private[core] def ownerOfRound(id: Int): Option[String] =
    Option(roundOwners.get(id)).map(_.describe)
}

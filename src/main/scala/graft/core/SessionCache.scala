package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-session memo cache whose entries are evicted when the session's
  * SparkContext stops, so long-lived JVMs that create and stop many
  * sessions (test suites, repeated Verify/Bench runs) don't accumulate
  * DataFrames — and through them dead SparkSession graphs — forever.
  *
  * Weak keys alone wouldn't work here: a cached DataFrame strongly
  * references its SparkSession through its QueryExecution, so a
  * WeakHashMap keyed on the session could never collect. Eviction has
  * to be explicit, and `onApplicationEnd` is the natural end of life.
  *
  * Granularity: entries are keyed per SESSION, but the eviction hook is
  * per CONTEXT (`onApplicationEnd` is a context-level event — Spark has
  * no per-session listener), so sessions sharing one context via
  * `newSession()` keep their entries until the context dies or
  * [[evict]] is called explicitly. The hook registry is also keyed per
  * context, so a manual [[evict]] followed by re-population does NOT
  * stack a second listener.
  *
  * Concurrency: the value thunk runs inside a lazy holder inserted with
  * `putIfAbsent`, so two threads racing a session's first access
  * compute the (possibly expensive — e.g. IVF codebook training) value
  * exactly once.
  *
  * Bound: a deployment that churns `newSession()` on one long-lived
  * context (per-request sessions on a shared app) never fires
  * `onApplicationEnd`, so context-end eviction alone is unbounded.
  * A session has no individual end-of-life event Spark exposes, and
  * weak keys can't work (values reference their session, see above) —
  * so the cache keeps entries for at most `maxSessions` LEAST RECENTLY
  * USED sessions; older sessions' entries are dropped and simply
  * recompute if that session ever comes back. Active sessions are
  * touched on every access and never evicted.
  */
final class SessionCache[K, V](maxSessions: Int = 64) {
  // lazy holder: insertion is atomic (putIfAbsent); only the WINNING
  // holder's thunk ever runs, and `lazy val` makes concurrent get()s
  // on it block rather than recompute
  private final class Holder(thunk: () => V) { lazy val get: V = thunk() }

  private val cache = TrieMap.empty[(SparkSession, K), Holder]
  private val hooked = TrieMap.empty[SparkContext, Unit]
  // LRU tick per session (monotonic counter, not wall clock); races
  // only skew eviction order, never correctness — an evicted-too-early
  // entry recomputes on next access
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastUse = TrieMap.empty[SparkSession, Long]

  def getOrElseUpdate(spark: SparkSession, key: K)(value: => V): V = {
    val sc = spark.sparkContext
    lastUse.put(spark, tick.incrementAndGet())
    if (lastUse.size > maxSessions) {
      lastUse.toSeq.sortBy(_._2)
        .dropRight(maxSessions)
        .foreach { case (s, t) =>
          // guard against evicting a session touched since the snapshot
          if (lastUse.remove(s, t)) evict(s)
        }
    }
    // hook once per context; a stopped context can't accept listeners
    // (addSparkListener would throw from a dead LiveListenerBus) — the
    // caller is about to fail on the actual Spark job anyway, so skip
    if (!sc.isStopped && hooked.putIfAbsent(sc, ()).isEmpty) {
      try sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictContext(sc)
      })
      catch {
        case _: IllegalStateException => hooked.remove(sc) // stop() raced us
      }
    }
    val holder = cache.get((spark, key)) match {
      case Some(h) => h
      case None =>
        val fresh = new Holder(() => value)
        cache.putIfAbsent((spark, key), fresh).getOrElse(fresh)
    }
    holder.get
  }

  /** Drop every entry belonging to `spark` (the hook stays registered —
    * re-population after a manual evict does not stack listeners).
    */
  def evict(spark: SparkSession): Unit =
    cache.keysIterator.filter(_._1 eq spark).toList.foreach(cache.remove)

  /** Drop every entry of every session on `sc` (context end-of-life). */
  private def evictContext(sc: SparkContext): Unit = {
    cache.keysIterator.filter(_._1.sparkContext eq sc).toList
      .foreach(cache.remove)
    lastUse.keysIterator.filter(_.sparkContext eq sc).toList
      .foreach(lastUse.remove)
    hooked.remove(sc)
  }

  def size: Int = cache.size
}

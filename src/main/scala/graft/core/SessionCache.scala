package graft.core

import scala.collection.concurrent.TrieMap

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
  * to be explicit, and `onApplicationEnd` is the session's natural end
  * of life.
  */
final class SessionCache[K, V] {
  private val cache = TrieMap.empty[(SparkSession, K), V]
  private val hooked = TrieMap.empty[SparkSession, Unit]

  def getOrElseUpdate(spark: SparkSession, key: K)(value: => V): V = {
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(spark)
      })
      ()
    })
    cache.getOrElseUpdate((spark, key), value)
  }

  /** Drop every entry belonging to `spark`. */
  def evict(spark: SparkSession): Unit = {
    cache.keysIterator.filter(_._1 eq spark).toList.foreach(cache.remove)
    hooked.remove(spark)
  }

  def size: Int = cache.size
}

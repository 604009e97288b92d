package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (time-window) join: every left row matched to the right
  * rows with `rightTime` in `[leftTime - window, leftTime]` within the
  * same key group.
  *
  * Spelled as a BUCKETIZED EQUI-JOIN rather than the naive theta-join:
  * both sides bucket time by `window`; a right match can only live in
  * the left row's bucket or the one before it, so the left side
  * explodes into those two probe buckets and the join runs on
  * (keys, bucket) with the range predicate as a residual filter.
  *
  * Scale rationale: a pure non-equi time predicate gives Catalyst no
  * join key — at corpus scale that is a BroadcastNestedLoopJoin
  * (O(|L| x |R|) comparisons and a full broadcast of one side). The
  * bucketed form is a plain hash-partitioned equi-join: cost is
  * O(matches within adjacent buckets), partitioning spreads by
  * (keys, bucket) so time-skew inside one key splits across buckets,
  * and AQE's skew handling applies as usual.
  */
object IntervalJoin {

  /** `leftTime` / `rightTime` must be NUMERIC columns in the same unit
    * as `window` (e.g. unix_micros). Output keeps all left and right
    * columns (caller aliases collisions beforehand).
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val lb = floor(col(leftTime) / window).cast("long")
    val l = left.withColumn("_probe", explode(array(lb, lb - 1)))
    val r = right.withColumn("_bucket",
      floor(col(rightTime) / window).cast("long"))
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    l.join(r,
      keyCond && l("_probe") === r("_bucket") &&
        r(rightTime) >= l(leftTime) - window &&
        r(rightTime) <= l(leftTime))
      .drop("_probe", "_bucket")
      // the key columns appear on both sides; keep the left copy
      .drop(r(keys.head), keys.tail.map(r(_)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase (salted) aggregation.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `buckets` sub-groups for a
  * partial aggregate, then merges the partials — the hot key's work
  * spreads over `buckets` tasks, at the cost of one extra (tiny)
  * shuffle over the partial rows. This is the manual complement to
  * AQE's skew-join splitting (enabled in [[graft.core.Graft]]), which
  * handles joins but not single-key aggregation skew.
  *
  * Works for any algebraic aggregate whose partial and merge forms are
  * expressible as columns (sum/sum, count/sum, min/min, max/max, ...).
  */
object Skew {

  /** Deterministic salt derived from row content (grouping keys +
    * value), so a map-task rerun after shuffle-fetch failure recomputes
    * identical salts — correctness never leans on Spark's
    * INDETERMINATE-stage full-rollback handling, which a
    * position-derived (`monotonically_increasing_id`) salt would
    * require. Spread comes from value diversity within a hot key; the
    * degenerate all-identical-values key collapses to one bucket, but
    * map-side partial aggregation already reduces that case to one row
    * per input partition before the shuffle.
    */
  private def salt(on: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(on: _*), lit(buckets.toLong))

  /** Salted sum+count per key (the building block for avg too). */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", salt(keyCols :+ col(valueCol), buckets))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum("_psum").as(s"sum_$valueCol"),
        sum("_pcnt").as("n_rows"))
  }
}

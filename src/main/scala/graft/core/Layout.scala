package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Physical-layout helpers. */
object Layout {

  /** Hash-spread `df` across the session's shuffle parallelism before
    * compute-heavy per-row or per-pair work (signature kernels, pair
    * joins, n-gram explodes).
    *
    * Why: a parquet file is only as parallel as its row groups — a
    * single-row-group file scans as ONE task, and everything up to the
    * first exchange (the whole map stage: kernels, explodes, broadcast
    * join probes) inherits that parallelism. One narrow O(corpus)
    * shuffle here buys full-width execution for the O(pairs)/O(tokens)
    * work that follows. On a large cluster where the scan already has
    * thousands of splits the exchange is redundant but harmless by the
    * same ratio: it costs one pass over the rows it feeds, while the
    * downstream work it spreads is quadratic (pairs) or fan-out
    * (explode) in those rows.
    */
  def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(col(key))

  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(key)
}

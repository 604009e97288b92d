package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps a ColumnNode, and the converters between
  * catalyst `Expression` and `Column` (`classic.ExpressionUtils`) are
  * `private[sql]`. This bridge lives in an `org.apache.spark.sql`
  * subpackage to expose exactly those two conversions to graft's custom
  * expressions — the standard extension-library pattern.
  */
object Bridge {
  // Version contract: `classic.ExpressionUtils` and `classic.Dataset
  // .ofRows` are Spark 4.x `private[sql]` INTERNALS (developed and
  // tested against 4.1.2). They can move or change shape in a major
  // bump without any deprecation cycle, so fail loudly and explicitly
  // at first use on an unexpected major version instead of surfacing
  // as a mysterious linkage error deep inside a query.
  require(org.apache.spark.SPARK_VERSION.startsWith("4."),
    s"graftbridge.Bridge relies on Spark 4.x private[sql] internals " +
      s"(ExpressionUtils, Dataset.ofRows); running on " +
      s"${org.apache.spark.SPARK_VERSION} — re-verify these entry points " +
      "before lifting this check")

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's shuffle-partition count off the TYPED SQLConf
    * (`sessionState` is `private[sql]`) — the fallback for platforms
    * where the string conf is non-numeric (e.g. "auto"), which would
    * NumberFormatException a raw `conf.get(...).toInt` parse.
    */
  def numShufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.numShufflePartitions

  /** Wrap a (resolved) logical plan as a DataFrame —
    * `classic.Dataset.ofRows` is `private[sql]`; needed to hand custom
    * LogicalPlan nodes (e.g. graft's native as-of join) to the session.
    */
  def dataset(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Truncate a frame's LOGICAL plan to a `LogicalRDD` over its
    * physical RDD — `Dataset.checkpoint`'s own internal move
    * (`LogicalRDD.fromDataset`, `private[sql]`) minus any RDD-lineage
    * truncation. For a PERSISTED frame this stops the Catalyst plan
    * from growing across iterative rounds (a self-joined round
    * otherwise DOUBLES its analyzed-plan subtree every iteration)
    * while failure recovery still walks the intact RDD lineage —
    * through the cache — back to the last real checkpoint
    * (graft.core.RoundBarrier's between-checkpoint discipline).
    */
  def truncatePlan(ds: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.DataFrame = {
    val classic = ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    dataset(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        classic.queryExecution.toRdd, classic, isStreaming = false))
  }
}

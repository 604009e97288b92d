package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key group (the time-series
  * join Spark's built-in operator set lacks; DuckDB spells it
  * `ASOF JOIN`, kdb `aj`).
  *
  * Implementation is Spark-first composition (preference (a) of
  * SURVEY §7.4 / the custom-operator ladder) rather than a custom
  * `SparkStrategy`: tag both inputs, union, and carry the right
  * payload forward with `last(_, ignoreNulls) over (partition by keys
  * order by time, side rows unbounded preceding..current)`.
  *
  * Scale shape: ONE shuffle (hash by keys) + one in-partition sort —
  * identical cost to a sort-merge join, with none of the range-join
  * row explosion a `l.t between r.t and r.t+big` rewrite would cause;
  * state per key is O(1) (the carried payload), so hot keys don't
  * blow memory.
  *
  * Contract: right payload columns must not collide with left column
  * names (rename beforehand); right payload values should be non-null
  * (a null payload cell would carry the previous non-null value past
  * it); ties at equal time match (right sorts before left via the side
  * tag, mirroring ASOF's `<=`). When several RIGHT rows share
  * (keys, time), the winner among them is undefined unless `tieBreak`
  * names right-side columns to order by (ascending; the LAST row in
  * that order wins) — without it, callers must guarantee at most one
  * right row per (keys, time), as [[graft.ops.EventOps]] does by
  * pre-deduplicating.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftPayload = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime).toSeq
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"column collision: ${leftPayload.intersect(rightPayload).mkString(",")}")

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    def nullAs(name: String, types: Map[String, org.apache.spark.sql.types.DataType]): Column =
      lit(null).cast(types(name)).as(name)

    // keep the matched right timestamp under a reserved name
    val matchedTime = s"asof_$rightTime"
    val l = left.select(
      (keys.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side")) ++
        leftPayload.map(col) ++
        (nullAs(rightTime, rightTypes).as(matchedTime) +:
          rightPayload.map(nullAs(_, rightTypes))): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side")) ++
        leftPayload.map(nullAs(_, leftTypes)) ++
        (col(rightTime).as(matchedTime) +: rightPayload.map(col)): _*)

    require(tieBreak.forall(rightPayload.contains),
      s"tieBreak must name right payload columns; got ${tieBreak.mkString(",")}")
    // Only right-vs-right ties need breaking: left rows at equal _t all
    // see the same preceding rights (their own nulls are ignored by
    // last(ignoreNulls)), and (_t, _side) already orders across sides.
    // tieBreak columns are null on left rows; nulls-first keeps left
    // rows' relative order stable without affecting the carried value.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: tieBreak.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (matchedTime +: rightPayload).foldLeft(l.unionByName(r)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("_side") === 1)
      .select(
        (keys.map(col) :+ col("_t").as(leftTime)) ++
          leftPayload.map(col) ++
          (col(matchedTime) +: rightPayload.map(col)): _*)
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row with
    * `rightTime >= leftTime` — implemented by running the backward
    * operator on negated numeric times (order reversal), so both
    * directions share one code path and one set of invariants.
    * Requires numeric time columns.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val l = left.withColumn(leftTime, -col(leftTime))
    val r = right.withColumn(rightTime, -col(rightTime))
    val joined = asOf(l, r, keys, leftTime, rightTime)
    joined
      .withColumn(leftTime, -col(leftTime))
      .withColumn(s"asof_$rightTime", -col(s"asof_$rightTime"))
  }

  /** The same as-of semantics through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] — streaming per-partition merge, one
    * exchange per side, O(1) state). Requires
    * [[graft.plans.AsOfJoinStrategy]] to be registered (GraftExtensions
    * or `GraftFunctions.register`). Output schema matches [[asOf]]:
    * left columns, then `asof_<rightTime>` and the right payload
    * (nulls when no right row is at-or-before).
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.Bridge
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side to FRESH exprIds: when both inputs derive
    // from the same scan (self-join shape), shared attribute ids across
    // the children confuse analysis/pruning around a custom node (the
    // analyzer's relation-dedup only knows built-in operators).
    val rAliases = right.queryExecution.analyzed.output
      .map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n'"))
    val rightPayload = rPlan.output
      .filterNot(a => keys.contains(a.name) || a.name == rightTime)
    val rt = attr(rPlan, rightTime)
    // fresh attributes for the matched columns (declared as produced)
    val matchedOutput =
      AttributeReference(s"asof_$rightTime", rt.dataType, nullable = true)() +:
        rightPayload.map(a =>
          AttributeReference(a.name, a.dataType, nullable = true)())
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), rt, rightPayload, matchedOutput,
      tieBreak.map(attr(rPlan, _)))
    Bridge.dataset(left.sparkSession, node)
  }
}

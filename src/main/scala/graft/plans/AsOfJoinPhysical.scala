package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator ladder (SURVEY §7.4
  * step (c)): a LogicalPlan node, a SparkStrategy, and a SparkPlan with
  * a streaming merge in `doExecute`, registered through
  * `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]).
  *
  * Physical contract: both children hash-cluster on the keys (the
  * planner's EnsureRequirements co-partitions them and inserts the
  * sorts from `requiredChildOrdering`), then each partition pair merges
  * in one pass carrying only the latest right match — O(1) state per
  * key, no row padding, no window buffers.
  *
  * Versus the composed form ([[graft.ops.AsOfJoin.asOf]]): the
  * composition pays ONE exchange over |L|+|R| padded-width rows plus a
  * window sort; the native operator pays one exchange per side over the
  * rows' natural width and streams the merge. Same asymptotics, fewer
  * bytes moved and no window state — and semantics are identical
  * (ties at equal (keys, time): the last right row in sort order wins;
  * callers wanting determinism under such ties pre-dedupe, as with the
  * composed form).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    matchedOutput: Seq[Attribute],
    tieBreak: Seq[Attribute] = Nil) extends BinaryNode {

  // The exec's cross-side comparators are built from LEFT data types and
  // applied to rows projected from the right; mismatched types (int vs
  // bigint key, date vs timestamp time) would read fields with the wrong
  // accessor and silently corrupt the merge. Fail at construction.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must match: left=${leftKeys.map(_.dataType)} " +
      s"right=${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match: left=${leftTime.dataType} " +
      s"right=${rightTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ matchedOutput

  override def producedAttributes: AttributeSet = AttributeSet(matchedOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    matchedOutput: Seq[Attribute],
    tieBreak: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matchedOutput

  override def producedAttributes: AttributeSet = AttributeSet(matchedOutput)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // tieBreak columns extend the right-side sort, so among right rows
  // sharing (keys, time) the LAST in tieBreak order is consumed last
  // and wins — same contract as the composed operator's tieBreak
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: tieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val matched = rTime +: rightPayload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // (keys, time) comparator across sides + key-only equality
      val ktOrdering = RowOrdering.createNaturalAscendingOrdering(
        (lKeys :+ lTime).map(_.dataType))
      val kOrdering = RowOrdering.createNaturalAscendingOrdering(
        lKeys.map(_.dataType))
      val lKT = UnsafeProjection.create(lKeys :+ lTime, leftOut)
      val rKT = UnsafeProjection.create(rKeys :+ rTime, rightOut)
      val lK = UnsafeProjection.create(lKeys, leftOut)
      val rK = UnsafeProjection.create(rKeys, rightOut)
      val matchedProj = UnsafeProjection.create(matched, rightOut)
      // positional: the joined row is already (left cols, matched cols)
      // in output order; the matched attrs are fresh so name/id binding
      // would not resolve
      val outProj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val nullMatch = new GenericInternalRow(matched.length)
      val joined = new JoinedRow()
      val rBuf = rIt.buffered
      var lastMatch: UnsafeRow = null
      var lastMatchKey: UnsafeRow = null
      lIt.map { lRow =>
        val lkt = lKT(lRow)
        // consume right rows at-or-before (keys, time); the LAST one
        // consumed with the same key is the as-of match
        while (rBuf.hasNext && ktOrdering.compare(rKT(rBuf.head), lkt) <= 0) {
          val r = rBuf.next()
          lastMatch = matchedProj(r).copy()
          lastMatchKey = rK(r).copy()
        }
        val m =
          if (lastMatchKey != null &&
              kOrdering.compare(lK(lRow), lastMatchKey) == 0) lastMatch
          else nullMatch
        outProj(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightPayload, n.matchedOutput, n.tieBreak) :: Nil
    case _ => Nil
  }
}

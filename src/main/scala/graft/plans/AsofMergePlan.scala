package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical node for the dedicated backward as-of join (the tier-(c)
  * custom-operator form of [[graft.operators.AsofJoin]]): whole-operator
  * semantics expressed as a Catalyst `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, planned by [[GraftStrategy]] into [[AsofMergeJoinExec]].
  *
  * Semantics (identical to `AsofJoin.asofBackward`, which the DuckDB
  * `ASOF LEFT JOIN` oracle pins): for each left row, attach the payload of
  * the single right row sharing the join keys with the greatest
  * `rightTime` ≤ `leftTime` (strictly `<` when `strict`); all-null payload
  * when no prior right row exists. Ties on (keys, rightTime) resolve to
  * the lexicographically greatest payload tuple, so output is
  * deterministic regardless of physical row order.
  *
  * The reference computes this attribution per request in Python
  * (`worker.py` joins job events to their latest prior state row); here it
  * is one distributed operator.
  *
  * @param outAttrs the attributes this node PRODUCES (`asof_<payload>`,
  *                 `asof_<rightTime>`) — declared via `producedAttributes`
  *                 so analysis knows they come from this operator, not its
  *                 children.
  */
case class AsofJoinPlan(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    outAttrs: Seq[Attribute],
    strict: Boolean,
    left: LogicalPlan,
    right: LogicalPlan)
    extends LogicalPlan with BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical backward as-of join: co-partition both sides on the join keys,
  * sort within partitions by (keys, time), and stream a single forward
  * merge per partition.
  *
  * Scale shape vs the union-merge form (`AsofJoin.asofBackward`):
  *   - same ONE shuffle per side (Catalyst plans the exchanges from
  *     `requiredChildDistribution`, so AQE coalescing still applies);
  *   - but no union of null-padded rows and no window state — the merge
  *     keeps exactly ONE buffered match per key group (O(1) memory), while
  *     the window form materializes both sides into one sorted run and
  *     carries `last(ignoreNulls)` frames across it;
  *   - output preserves the left child's partitioning and ordering
  *     (`outputPartitioning`/`outputOrdering` below), so a downstream
  *     `groupBy(keys)` — the common "enrich then re-aggregate" pipeline —
  *     plans with NO further exchange. The union form destroys the
  *     partitioning by filtering a union, forcing a re-shuffle.
  *
  * The right side's required ordering appends the payload columns after
  * the timestamp, which makes the "overwrite the buffered match while
  * admissible" loop resolve equal-(keys,time) duplicates to the greatest
  * payload tuple — the same dedup `asofBackward` runs as a groupBy(max)
  * pre-pass, for free.
  */
case class AsofMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    outAttrs: Seq[Attribute],
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // requireAllClusterKeys: a child pre-partitioned on a strict SUBSET of
  // the keys would satisfy plain clustering but could disagree with the
  // other side's layout; requiring the full key list keeps both sides
  // hash-aligned by VALUE, which the per-partition zip merge depends on.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: payload)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val matchExprs = payload :+ rightTime
    val resultAttrs = lOut ++ outAttrs
    val keyTypes = lKeyExprs.map(_.dataType)
    val timeTypes = Seq(lTimeExpr.dataType)
    val strictB = strict

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val matchProj = UnsafeProjection.create(matchExprs, rOut)
      val resultProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
      val nullMatch = new GenericInternalRow(matchExprs.length)
      val joined = new JoinedRow

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var curKey: UnsafeRow = null // copy of the left key group in flight
      var matched: UnsafeRow = null // latest admissible right payload (copy)
      def advanceRight(): Unit =
        rRow = if (rIter.hasNext) rIter.next() else null

      lIter.map { lRow =>
        val k = lKeyProj(lRow)
        if (curKey == null || keyOrd.compare(k, curKey) != 0) {
          curKey = k.copy()
          matched = null
          // drop right groups strictly before the new left key (includes
          // right rows with null keys, which sort first and never match)
          while (rRow != null && keyOrd.compare(rKeyProj(rRow), curKey) < 0) {
            advanceRight()
          }
        }
        // null join keys / null left time never match (ASOF JOIN semantics)
        val lt = lTimeProj(lRow).copy()
        val usable = !curKey.anyNull && !lt.isNullAt(0)
        if (usable) {
          var continue = true
          while (continue && rRow != null &&
            keyOrd.compare(rKeyProj(rRow), curKey) == 0) {
            val rt = rTimeProj(rRow)
            if (rt.isNullAt(0)) {
              advanceRight() // null right time: consume, never matches
            } else {
              val cmp = timeOrd.compare(rt, lt)
              if (if (strictB) cmp < 0 else cmp <= 0) {
                matched = matchProj(rRow).copy()
                advanceRight()
              } else {
                continue = false
              }
            }
          }
        }
        numOutputRows += 1
        val m = if (usable && matched != null) matched else nullMatch
        resultProj(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsofJoinPlan]] to [[AsofMergeJoinExec]].
  * Injected at session build via [[graft.functions.GraftExtensions]]
  * (`injectPlannerStrategy`) or onto a live session via
  * `GraftBridge.ensureStrategy` (the `experimental.extraStrategies` path —
  * needed for driver-owned sessions built without the extensions config).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofMergeJoinExec(
        p.leftKeys, p.rightKeys, p.leftTime, p.rightTime, p.payload,
        p.outAttrs, p.strict, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

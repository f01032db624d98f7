package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join, the preference-ladder (c) path: Spark has
  * no ASOF JOIN (the reference workload leans on kdb/pandas
  * `merge_asof` semantics — see the q25/q89 window formulations), and
  * while the union+last_value(ignoreNulls) window rewrite expresses it,
  * a dedicated operator states the semantics once and executes them as
  * a single co-partitioned merge pass:
  *
  *  - logical [[AsOfJoinPlan]] (resolved from birth — built against
  *    analyzed children, so the analyzer has nothing to infer),
  *  - [[AsOfJoinStrategy]] planning it to [[AsOfJoinExec]]
  *    (registered via SparkSessionExtensions / experimental strategies),
  *  - physical [[AsOfJoinExec]]: requiredChildDistribution clusters both
  *    sides on the key and requiredChildOrdering sorts (key, ts[, seq]),
  *    so EnsureRequirements provisions exactly one exchange per side —
  *    the same cost envelope as a sort-merge equi-join — and doExecute
  *    is a linear two-pointer merge per partition: O(|L| + |R|), no
  *    buffered window frames, no unioned intermediate, no per-row probe.
  *
  * Left-outer shape: every left row emits once, right columns null when
  * no right row qualifies. Backward picks the LATEST right row with
  * rts <= lts (ties by highest seq — q25's "latest wins"); forward the
  * EARLIEST with rts >= lts (ties by lowest seq); `tolUs >= 0` bounds
  * |rts - lts|. Keys and timestamps are BIGINT columns (callers project
  * unix_micros first — the graft.operators.AsOf wrapper does).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightSeq: Attribute,
    tolUs: Long, forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; everything else passes. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rseq, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rseq,
        tol, fwd) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightSeq: Attribute,
    tolUs: Long, forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on the join key — EnsureRequirements inserts
    * compatible hash exchanges (or reuses existing ones), exactly as for
    * a shuffled equi-join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, ts) on the left; (key, ts, seq) on the right so equal-ts
    * candidates resolve deterministically (q25's latest-wins / q89's
    * earliest-wins tie rule). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightSeq, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rWidth = right.output.size
    val tol = tolUs
    val fwd = forward
    // bind the projection against the NULLABLE output attributes — the
    // no-match joined row carries nulls on the right, and binding to the
    // children's original (non-null) attrs would elide the null checks
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // one-row lookahead over the right side; rows are retained across
      // next() calls, so each is copied exactly once on read
      var rHead: InternalRow = null
      def advanceRight(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()
      // skip right rows with null key/ts — they can never match
      def skipNullRight(): Unit =
        while (rHead != null &&
          (rHead.isNullAt(rkOrd) || rHead.isNullAt(rtOrd))) advanceRight()
      skipNullRight()
      // backward state: latest right row seen for the current left key
      var candKey = 0L
      var candTs = 0L
      var cand: InternalRow = null
      lIter.map { lRow =>
        val matched: InternalRow =
          if (lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)) null
          else {
            val k = lRow.getLong(lkOrd)
            val t = lRow.getLong(ltOrd)
            if (fwd) {
              // discard right rows strictly before (k, t); the head is
              // then the earliest candidate for this AND later left rows
              while (rHead != null && {
                val rk = rHead.getLong(rkOrd)
                rk < k || (rk == k && rHead.getLong(rtOrd) < t)
              }) { advanceRight(); skipNullRight() }
              if (rHead != null && rHead.getLong(rkOrd) == k &&
                (tol < 0L || rHead.getLong(rtOrd) - t <= tol)) rHead
              else null
            } else {
              // consume right rows at/before (k, t); remember the last
              // one per key — the latest-at-or-before candidate
              while (rHead != null && {
                val rk = rHead.getLong(rkOrd)
                rk < k || (rk == k && rHead.getLong(rtOrd) <= t)
              }) {
                if (rHead.getLong(rkOrd) == k) {
                  cand = rHead; candKey = k; candTs = rHead.getLong(rtOrd)
                }
                advanceRight(); skipNullRight()
              }
              if (cand != null && candKey == k &&
                (tol < 0L || t - candTs <= tol)) cand
              else null
            }
          }
        resultProj(joined(lRow, if (matched == null) nullRight else matched))
      }
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator keyed band join (|l.ts − r.ts| ≤ tol per key), the
  * second preference-ladder (c) operator beside [[AsOfJoinPlan]]. Open
  * source Spark plans a per-key time-band join as an equi-join with the
  * band as residual — correct, but each key group materializes through
  * the join buffer with no time locality, or (without the equi key) as a
  * BNLJ; the q84 operator family works around it by exploding intervals
  * into buckets. A dedicated operator states the band semantics once and
  * executes them as one co-partitioned sliding-window merge:
  *
  *  - logical [[BandJoinPlan]] (resolved from birth, like AsOfJoinPlan),
  *  - [[BandJoinStrategy]] planning it to [[BandJoinExec]],
  *  - physical [[BandJoinExec]]: both sides cluster on the key and sort
  *    (key, ts) — one exchange per side, the sort-merge-join envelope —
  *    and doExecute is a linear merge with a ring buffer holding only
  *    the right rows inside the live 2·tol window of the current left
  *    row: O(|L| + |R| + matches) time, O(band occupancy) memory, the
  *    working set a band join inherently needs.
  *
  * Inner-join shape: a (left, right) pair emits iff keys are equal and
  * |rts − lts| ≤ tolUs. Keys and timestamps are BIGINT columns (callers
  * project unix_micros first — the graft.operators.AsOf wrapper does).
  */
final case class BandJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    tolUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoinPlan]] → [[BandJoinExec]]; everything else passes. */
class BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(l, r, lk, rk, lts, rts, tol) =>
      BandJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tol) :: Nil
    case _ => Nil
  }
}

final case class BandJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    tolUs: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ::
      Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    val tol = tolUs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      // one-row lookahead over the right side
      var rHead: InternalRow = null
      def advanceRight(): Unit = {
        rHead = if (rIter.hasNext) rIter.next().copy() else null
        while (rHead != null &&
          (rHead.isNullAt(rkOrd) || rHead.isNullAt(rtOrd)))
          rHead = if (rIter.hasNext) rIter.next().copy() else null
      }
      advanceRight()
      // ring buffer: the right rows of the current key whose ts is still
      // inside [lts − tol, lts + tol] for the CURRENT left row; left ts
      // is nondecreasing within a key, so eviction from the front is
      // monotone and each right row enters and leaves exactly once
      val buf = scala.collection.mutable.ArrayDeque.empty[InternalRow]
      var bufKey = 0L
      var bufKeySet = false
      lIter.flatMap { lRow =>
        if (lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)) Iterator.empty
        else {
          val k = lRow.getLong(lkOrd)
          val t = lRow.getLong(ltOrd)
          if (!bufKeySet || bufKey != k) { buf.clear(); bufKey = k; bufKeySet = true }
          // evict buffered rows that fell behind the band
          while (buf.nonEmpty && buf.head.getLong(rtOrd) < t - tol)
            buf.removeHead()
          // pull right rows up to the band's trailing edge; rows before
          // the leading edge can never match a later (larger-t) left row
          // of this key, so they discard instead of buffering
          while (rHead != null && {
            val rk = rHead.getLong(rkOrd)
            rk < k || (rk == k && rHead.getLong(rtOrd) <= t + tol)
          }) {
            if (rHead.getLong(rkOrd) == k &&
              rHead.getLong(rtOrd) >= t - tol) buf.append(rHead)
            advanceRight()
          }
          buf.iterator.map(rRow => resultProj(joined(lRow, rRow)))
        }
      }
    }
  }
}

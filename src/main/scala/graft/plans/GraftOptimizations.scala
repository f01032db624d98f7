package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom join nodes — the `Rule[LogicalPlan]`
  * rung of the extension ladder beside the plan nodes and strategies.
  *
  * Catalyst's own PushDownPredicates only understands the operators it
  * ships: a Filter above an [[AsOfJoinPlan]] or [[BandJoinPlan]] stays
  * ABOVE the join, so the merge processes rows the predicate kills
  * anyway and the parquet scan underneath never sees the filter. This
  * rule restores the standard pushdown using each node's own
  * semantics:
  *
  *  - [[AsOfJoinPlan]] emits every LEFT row exactly once (left-outer
  *    shape), so left-only deterministic predicates commute with the
  *    join. Right-side predicates must STAY above: they observe the
  *    null-completed columns, and filtering the right input instead
  *    would turn no-longer-matched rows into nulls rather than drop
  *    them.
  *  - [[BandJoinPlan]] is an inner join: single-side deterministic
  *    predicates commute on either side.
  *
  * Once pushed, the predicate sits directly on the child plan, where
  * FileSourceStrategy's PhysicalOperation collapses it into the scan
  * (PushedFilters / partition pruning) at physical planning — at 100 TB
  * the difference between merging everything and scanning one slice.
  * The rule is fixpoint-safe: after a push the remaining conjuncts are
  * exactly the non-pushable ones, so a second application is a no-op.
  */
object PushFilterThroughGraftJoins extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case f @ Filter(cond, j: BandJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, rest1) = conjuncts.partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      val (rightOnly, rest) = rest1.partition(p =>
        p.deterministic && p.references.subsetOf(j.right.outputSet))
      if (leftOnly.isEmpty && rightOnly.isEmpty) f
      else {
        val nl =
          if (leftOnly.isEmpty) j.left
          else Filter(leftOnly.reduce(And), j.left)
        val nr =
          if (rightOnly.isEmpty) j.right
          else Filter(rightOnly.reduce(And), j.right)
        val pushed = j.copy(left = nl, right = nr)
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite an INNER equi-join to a LEFT SEMI join when
  * the join is provably a pure FILTER of the left side — the
  * "join-to-semi-join reduction" mature engines apply and OSS Spark
  * only reaches via EXISTS subqueries (`RewritePredicateSubquery`);
  * the same query phrased as a plain join keeps the full inner join.
  *
  * Why it matters at 100 TB: an inner hash join materializes the
  * right side's full payload in the build map and emits one output
  * row per match; the semi form builds a KEY-ONLY set, probes with
  * early-out on first hit, and can never multiply rows — less build
  * memory, less probe work, and the right side's non-key columns are
  * pruned out of its scan entirely.
  *
  * Soundness — the rule fires only when ALL THREE hold (the
  * [[RedundantLeftJoinElimination]] evidence discipline, INNER form):
  *  1. Join type is INNER with a condition: each left row survives
  *     once per match; with matches ≤ 1 the join duplicates nothing,
  *     so inner ≡ semi on left columns.
  *  2. The right side is PROVABLY UNIQUE on the join keys — an
  *     `Aggregate` (under attribute-only pruning Projects) whose
  *     grouping attributes are all equated to left expressions in
  *     equi-conjuncts of the condition. Uniqueness is read off the
  *     plan; no constraints or hints are trusted. Extra conjuncts
  *     only reduce matches further.
  *  3. Nothing above the join references a right-side column
  *     (`Project(ps, join)` with every reference inside the left
  *     output) — the filter is all the query wanted from the join.
  *
  * Unlike the LEFT OUTER rule the join cannot be DROPPED (an
  * unmatched left row must still vanish) — it degrades to the
  * cheapest join kind with identical semantics. The rewritten plan no
  * longer matches the pattern (LeftSemi ≠ Inner), so the fixpoint
  * batch terminates.
  *
  * Registered via [[graft.functions.GraftExtensions]] next to
  * [[AntiJoinRewrite]] and [[RedundantLeftJoinElimination]].
  */
object InnerUniqueJoinToSemi extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      stripPruning(child)
    case other => other
  }

  private def equatedRightAttrs(j: Join): Seq[Attribute] =
    j.condition.toSeq.flatMap(splitConjuncts).collect {
      case EqualTo(l, r: Attribute)
          if j.right.outputSet.contains(r) &&
            l.references.subsetOf(j.left.outputSet) => r
      case EqualTo(l: Attribute, r)
          if j.right.outputSet.contains(l) &&
            r.references.subsetOf(j.left.outputSet) => l
    }

  private def rightUniqueOnKeys(j: Join): Boolean = stripPruning(j.right) match {
    case agg: Aggregate if agg.groupingExpressions.nonEmpty =>
      val groupAttrs = agg.groupingExpressions.collect { case a: Attribute => a }
      groupAttrs.size == agg.groupingExpressions.size && {
        val equated = equatedRightAttrs(j)
        groupAttrs.forall(ga => equated.exists(_.semanticEquals(ga)))
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(ps, j @ Join(left, right, Inner, Some(cond), hint))
        if ps.forall(_.references.subsetOf(left.outputSet)) &&
          rightUniqueOnKeys(j) =>
      Project(ps, Join(left, right, LeftSemi, Some(cond), hint))
  }
}

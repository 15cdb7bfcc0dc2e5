package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: drop a LEFT OUTER join whose right side provably
  * cannot change the result — the "join elimination" feature mature
  * SQL engines ship (Oracle, SQL Server, DB2) and OSS Spark does not:
  * Catalyst's column pruning empties the unused side's projection but
  * still builds, shuffles, and probes the join.
  *
  * The shape arises constantly under composed views/query generators:
  * a query joins a per-key lookup "just in case", an outer `select`
  * keeps only base-table columns, and the lookup — often a full
  * aggregation over a large table — runs for nothing. At 100 TB that
  * is an entire wasted scan + shuffle + hash build per query.
  *
  * Soundness — the rule fires only when ALL THREE hold:
  *  1. Join type is LEFT OUTER: every left row survives exactly
  *     max(1, matches) times, so with matches ≤ 1 the join is
  *     row-for-row the left side. (INNER is NOT eligible: an
  *     unmatched left row would vanish, and without declared
  *     referential integrity "always matched" cannot be proven.)
  *  2. The right side is PROVABLY UNIQUE on the join keys: it is an
  *     `Aggregate` (possibly under attribute-only pruning Projects)
  *     whose grouping expressions are plain attributes, and EVERY
  *     grouping attribute is equated to a left-side expression in
  *     some equi-conjunct of the join condition. Grouping keys are
  *     unique by construction, so each left row matches at most one
  *     right row; extra conjuncts only reduce matches further. No
  *     trusted constraints, hints, or catalog metadata are involved —
  *     uniqueness is read off the plan itself.
  *  3. Nothing above the join references a right-side column: the
  *     rule matches `Project(ps, join)` with every `ps` reference
  *     inside the left output (the shape Catalyst's own column
  *     pruning produces when the right side is unused).
  * Null join keys never match and their left rows are preserved by
  * LEFT OUTER either way — nullability is irrelevant to the rewrite.
  *
  * Registered via [[graft.functions.GraftExtensions]] next to
  * [[AntiJoinRewrite]]; the optimizer batch runs to fixpoint, so
  * chains of redundant joins unwind one layer per pass.
  */
object RedundantLeftJoinElimination extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Strip attribute-only projections (column-pruning artifacts) off
    * the right side; they preserve attribute identity and uniqueness. */
  private def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      stripPruning(child)
    case other => other
  }

  /** Right-side attributes equated to a purely-left expression in the
    * join condition's conjuncts. */
  private def equatedRightAttrs(j: Join): Seq[Attribute] =
    j.condition.toSeq.flatMap(splitConjuncts).collect {
      case EqualTo(l, r: Attribute)
          if j.right.outputSet.contains(r) &&
            l.references.subsetOf(j.left.outputSet) => r
      case EqualTo(l: Attribute, r)
          if j.right.outputSet.contains(l) &&
            r.references.subsetOf(j.left.outputSet) => l
    }

  /** Is the right side provably unique on the equated join keys? */
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
    case Project(ps, j @ Join(left, _, LeftOuter, Some(_), _))
        if ps.forall(_.references.subsetOf(left.outputSet)) &&
          rightUniqueOnKeys(j) =>
      Project(ps, left)
  }
}

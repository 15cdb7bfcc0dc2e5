package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `l LEFT JOIN r ON lk = rk` followed by
  * `WHERE rk IS NULL` is the classic hand-written anti join — but
  * Catalyst executes it literally: the outer join materializes every
  * matched row (potentially many per left row for 1:N keys) only for
  * the filter to discard them all. This rule rewrites the pair into a
  * real LEFT ANTI join: the probe stops at the first match, matched
  * rows never surface, and the join output carries only the left side.
  *
  * Correctness — the rule fires in exactly two provably-sound cases:
  *  1. The filtered column is a RIGHT EQUI-JOIN KEY: a matched row
  *     satisfies `lk = rk`, which requires rk non-null; an unmatched row
  *     has every right column null. Holds regardless of rk's pre-join
  *     nullability — null keys never match.
  *  2. The filtered column is NON-NULLABLE in the right child's own
  *     output schema: a matched row copies the right row's value, which
  *     cannot be null, so post-join null ⟺ unmatched. (Nullability must
  *     be read off the right CHILD — the join's output marks every
  *     right column nullable by outer-join convention. Parquet scans
  *     usually report nullable, so this arm typically fires when the
  *     query declares the invariant, e.g. `coalesce(pk, lit(-1))`.)
  * It does NOT fire on a nullable non-key right column: there a matched
  * row may legitimately carry a null and the rewrite would drop it.
  * Right columns referenced above the filter are replaced by null
  * literals aliased under their original exprIds: in every surviving
  * row they were null anyway.
  *
  * At 100 TB the difference is structural: anti joins build a hash set
  * of keys only (no payload), skew-matched rows are never produced,
  * and AQE can pick broadcast-anti for a small right side.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  */
object AntiJoinRewrite extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Is `a` a right-side equi-join key of `j`? */
  private def isRightEquiKey(a: Attribute, j: Join): Boolean =
    j.condition.exists { cond =>
      splitConjuncts(cond).exists {
        case EqualTo(l, r: Attribute) =>
          r.semanticEquals(a) && j.right.outputSet.contains(a) &&
            l.references.subsetOf(j.left.outputSet)
        case EqualTo(l: Attribute, r) =>
          l.semanticEquals(a) && j.right.outputSet.contains(a) &&
            r.references.subsetOf(j.left.outputSet)
        case _ => false
      }
    }

  /** Is `a` non-nullable in the right CHILD's output (not the join's —
    * there every right attribute is nullable by outer-join convention)? */
  private def isNonNullableRightCol(a: Attribute, j: Join): Boolean =
    j.right.output.exists(ra => ra.exprId == a.exprId && !ra.nullable)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(IsNull(a: Attribute), j @ Join(l, r, LeftOuter, Some(_), hint))
        if isRightEquiKey(a, j) || isNonNullableRightCol(a, j) =>
      val anti = Join(l, r, LeftAnti, j.condition, hint)
      // keep the original output shape: right columns become typed null
      // literals under their original exprIds (they are null in every
      // surviving row by definition of "unmatched")
      val projList = l.output ++ r.output.map { ra =>
        Alias(Literal(null, ra.dataType), ra.name)(exprId = ra.exprId,
          qualifier = ra.qualifier)
      }
      Project(projList, anti)
  }
}

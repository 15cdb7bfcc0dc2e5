package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeMap, EqualTo, Expression, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: merge an INNER self-join of two aggregations over
  * the SAME input, joined on their full grouping keys, into ONE
  * aggregation computing both sides' aggregate lists — the
  * "groupBy-split-then-join" anti-pattern users write when two metric
  * sets are developed separately (`orders.groupBy(k).agg(count)` ⋈
  * `orders.groupBy(k).agg(sum)`), which mature engines fold via
  * common-subexpression/view matching and OSS Spark executes as two
  * full scans, two shuffles and a join.
  *
  * Why it matters at 100 TB: the rewrite removes an ENTIRE second
  * corpus scan + partial/final aggregation + the keyed join exchange —
  * the dominant costs of the query — leaving one scan and one shuffle.
  *
  * Soundness — the rule fires only when ALL FOUR hold (the evidence
  * discipline of the other three graft rules: read proofs off the
  * plan, trust no constraints):
  *  1. Join type is INNER with a condition that is EXACTLY a
  *     conjunction of `EqualTo` between left-output and right-output
  *     attributes — no residuals (a residual could drop rows the
  *     merged form would keep).
  *  2. Both sides are `Aggregate`s (under attribute-only pruning
  *     Projects) whose grouping expressions are plain attributes, and
  *     the equi-conjuncts cover ALL grouping keys of BOTH sides, each
  *     left key equated to the positionally-corresponding right key
  *     after child remapping. Full-key coverage makes each side
  *     unique on the join keys, so the join is 1:1 and merging cannot
  *     change multiplicities.
  *  3. The two aggregation INPUTS are the same relation:
  *     `stripPruning(left.child).sameResult(stripPruning(right.child))`
  *     with positionally matching output names/types (column-pruning
  *     Projects are stripped first — the two sides legitimately prune
  *     to different column sets; pruning re-narrows the merged plan on
  *     the next fixpoint pass).
  *  4. Each side's aggregate list contains only its grouping
  *     passthroughs and genuine `Alias`ed aggregate expressions —
  *     every output attribute is reconstructible in the merged node
  *     under its ORIGINAL exprId (nothing upstream re-resolves).
  *
  * NULL grouping keys: an inner equi-join drops each side's NULL-key
  * group row (`null = null` is not TRUE), while a single aggregation
  * would keep it — so the merged aggregate sits on a `Filter(IsNotNull
  * (key₁) AND …)` over the shared input. The filter also pushes to the
  * scan, which the join form never could.
  *
  * The rewritten plan has no Join, so the fixpoint batch terminates.
  * Registered via [[graft.functions.GraftExtensions]] next to
  * [[AntiJoinRewrite]], [[RedundantLeftJoinElimination]] and
  * [[InnerUniqueJoinToSemi]].
  */
object MergeAggSelfJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      stripPruning(child)
    case other => other
  }

  /** Both grouping lists must be attribute-only; returns them. */
  private def groupAttrs(agg: Aggregate): Option[Seq[Attribute]] = {
    val as = agg.groupingExpressions.collect { case a: Attribute => a }
    if (as.size == agg.groupingExpressions.size && as.nonEmpty) Some(as)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(la, ra, Inner, Some(cond), _) =>
      val rewritten = for {
        a <- Some(la).collect { case ag: Aggregate => ag }
        b <- Some(ra).collect { case ag: Aggregate => ag }
        ga <- groupAttrs(a)
        gb <- groupAttrs(b)
        if ga.size == gb.size
        ca = stripPruning(a.child)
        cb = stripPruning(b.child)
        if ca.sameResult(cb)
        if ca.output.size == cb.output.size &&
          ca.output.zip(cb.output).forall { case (x, y) =>
            x.name == y.name && x.dataType == y.dataType }
        // map every right-child attribute onto the left child
        remap = AttributeMap(cb.output.zip(ca.output))
        // condition must be PURE full-key equality: every conjunct an
        // EqualTo over (left grouping key, right grouping key) that
        // remaps to the SAME left attribute, and all keys covered
        conjuncts = splitConjuncts(cond)
        pairs = conjuncts.map {
          case EqualTo(l: Attribute, r: Attribute)
              if a.outputSet.contains(l) && b.outputSet.contains(r) => Some((l, r))
          case EqualTo(r: Attribute, l: Attribute)
              if a.outputSet.contains(l) && b.outputSet.contains(r) => Some((l, r))
          case _ => None
        }
        if pairs.forall(_.isDefined)
        keyPairs = pairs.flatten
        // join keys must BE the grouping attrs (Aggregate passes
        // grouping attributes through under the same exprId, so output
        // attr ≡ grouping attr when this holds)
        if ga.forall(g => keyPairs.exists(_._1.semanticEquals(g)))
        if gb.forall(g => keyPairs.exists(_._2.semanticEquals(g)))
        // every equated pair must denote the SAME child column once
        // both sides are expressed over the left child
        if keyPairs.forall { case (l, r) =>
          ga.exists(_.semanticEquals(l)) && gb.exists(_.semanticEquals(r)) &&
            remap.get(r).exists(_.semanticEquals(l)) }
        // right grouping keys remap exactly onto the left grouping set
        if gb.forall(g => remap.get(g).exists(m => ga.exists(_.semanticEquals(m))))
        merged <- merge(a, b, ga, remap, ca)
      } yield merged
      rewritten.getOrElse(j)
  }

  private def merge(a: Aggregate, b: Aggregate, ga: Seq[Attribute],
                    remap: AttributeMap[Attribute],
                    ca: LogicalPlan): Option[LogicalPlan] = {
    // rebuild b's aggregate list over the left child, PRESERVING b's
    // output exprIds so everything above the join resolves unchanged
    val remappedB: Seq[Option[NamedExpression]] = b.aggregateExpressions.map { ne =>
      val moved = ne.transform { case attr: Attribute => remap.getOrElse(attr, attr) }
      moved match {
        case al: Alias =>
          Some(Alias(al.child, al.name)(exprId = ne.exprId, qualifier = al.qualifier))
        case attr: Attribute =>
          Some(Alias(attr, ne.name)(exprId = ne.exprId))
        case _ => None
      }
    }
    if (remappedB.exists(_.isEmpty)) None
    else {
      // dropping NULL-key input rows reproduces the inner join's
      // elimination of the NULL group — and pushes to the scan
      val notNull = ga.map(IsNotNull(_): Expression).reduce(And)
      Some(Aggregate(a.groupingExpressions,
        a.aggregateExpressions ++ remappedB.flatten,
        Filter(notNull, ca)))
    }
  }
}

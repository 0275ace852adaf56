package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a filter `sorted_jaccard(a, b) >= τ` implies the
  * size-ratio bound `|a| ≥ τ·|b| ∧ |b| ≥ τ·|a|` (jaccard ≤ min/max of the
  * set sizes), so inject those cheap conjuncts ahead of the expensive
  * merge — users writing the naive threshold filter get the prune the
  * hand-tuned operator (Dedup.ngramJaccardPairs) applies manually. The
  * added predicates reference each side's column separately, so Catalyst
  * can push them into the join and below it. */
object JaccardSizePruneRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Join

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      withBounds(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(l, r, jt, Some(cond), hint) =>
      withBounds(cond).map(c => Join(l, r, jt, Some(c), hint)).getOrElse(j)
  }

  /** Rewritten condition with the implied size bounds PREPENDED (so the
    * cheap comparisons short-circuit ahead of the merge-jaccard in the
    * left-to-right And evaluation); None when nothing to add. Thresholds
    * are harvested ONLY from top-level conjuncts: a `jaccard >= τ` under
    * OR/NOT/CASE is not implied by the condition as a whole, and injecting
    * its bounds would wrongly drop rows that survive via another branch. */
  private def withBounds(cond: Expression): Option[Expression] = {
    val existing = splitConjuncts(cond)
    val extra = existing.collect {
      case GreaterThanOrEqual(SortedJaccardExpr(a, b), lit @ Literal(_, _)) =>
        sizeBound(a, b, lit)
      case LessThanOrEqual(lit @ Literal(_, _), SortedJaccardExpr(a, b)) =>
        sizeBound(a, b, lit)
    }.flatten // individual conjuncts, so idempotence check sees each
      .filterNot(e => existing.exists(_.semanticEquals(e)))
    if (extra.isEmpty) None
    else Some(extra.foldRight(cond)((e, acc) => And(e, acc)))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def sizeBound(a: Expression, b: Expression, tau: Literal): Seq[Expression] = {
    val sa = Cast(Size(a), org.apache.spark.sql.types.DoubleType)
    val sb = Cast(Size(b), org.apache.spark.sql.types.DoubleType)
    val t = Cast(tau, org.apache.spark.sql.types.DoubleType)
    Seq(GreaterThanOrEqual(sa, Multiply(t, sb)),
      GreaterThanOrEqual(sb, Multiply(t, sa)))
  }
}

/** Session extensions registering graft's Catalyst additions:
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JaccardSizePruneRule)
    e.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}

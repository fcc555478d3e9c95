package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous windowed top-k idiom
  *
  *   SELECT <cols ∌ rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rn FROM t)
  *   WHERE rn <= k
  *
  * into the native [[GroupedTopK]] operator whenever the rank column itself
  * is dropped by the enclosing projection — the window formulation shuffles
  * and fully sorts every row of every group to then discard all but k,
  * while GroupedTopK ships at most k rows per (group × task) through the
  * exchange (bounded buffers on both sides; see GroupedTopK scaladoc, incl.
  * the high-cardinality-group caveat — the rewrite preserves semantics
  * regardless, memory is the trade).
  *
  * Guards: exactly one window expression (a row_number), a non-empty total
  * ORDER BY, a bare `rn <op> literal` predicate, and a projection that only
  * touches the window's input columns. Ties under a non-total order are
  * nondeterministic in BOTH formulations, so the rewrite never changes a
  * well-defined result.
  *
  * Register via `spark.experimental.extraOptimizations` or
  * [[graft.GraftExtensions]] (spark.sql.extensions).
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def rowNumberAttr(w: Window): Option[Attribute] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a.toAttribute)
      case _ => None
    }

  /** k such that cond ≡ (rn ≤ k), or None. */
  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(k: Int, IntegerType)) if r.semanticEquals(rn) => Some(k)
    case LessThan(r: Attribute, Literal(k: Int, IntegerType)) if r.semanticEquals(rn) => Some(k - 1)
    case EqualTo(r: Attribute, Literal(1, IntegerType)) if r.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), r: Attribute) if r.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), r: Attribute) if r.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** Above this k the bounded-buffer operator's memory (k rows per group
    * per task) stops being obviously better than WindowExec's
    * sort-and-spill — leave large-k rank filters to the window plan.
    */
  val MaxRewriteK = 10000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      (for {
        rn <- rowNumberAttr(w)
        k <- limitFrom(cond, rn)
        if k > 0 && k <= MaxRewriteK
        if w.orderSpec.nonEmpty
        if !projList.exists(_.references.contains(rn))
        if projList.forall(_.references.subsetOf(w.child.outputSet))
      } yield Project(projList, GroupedTopK(w.partitionSpec, w.orderSpec, k, w.child)))
        .getOrElse(p)
  }
}

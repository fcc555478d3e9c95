package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  * ORDER BY, a `rn <op> literal` predicate (the rank may sit behind a
  * widening cast — `rn <= 3L` — and the literal behind a foldable cast —
  * `CAST(3 AS INT)`), and a projection that only touches the window's input
  * columns. Ties under a non-total order are nondeterministic in BOTH
  * formulations, so the rewrite never changes a well-defined result.
  *
  * `rank() = 1` is deliberately NOT rewritten: rank admits ties, so the
  * filter can keep MORE than one row per group under a non-total order,
  * whereas GroupedTopK always emits exactly min(k, |group|) rows — the two
  * only coincide when the order is total, which the rule cannot verify.
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

  /** The rank attribute itself, possibly behind a widening integral cast —
    * `rn <= 3L` analyzes to `Cast(rn AS BIGINT) <= 3L`, and an up-cast of
    * row_number (always ≥ 1, ≤ 2^31−1) is value-preserving.
    */
  private def isIntegral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType || dt == ShortType || dt == ByteType

  private def isRank(e: Expression, rn: Attribute): Boolean = e match {
    case r: Attribute => r.semanticEquals(rn)
    case Cast(r: Attribute, dt, _, _)
        if dt == LongType || dt == IntegerType => r.semanticEquals(rn)
    case _ => false
  }

  /** An integral literal bound — bare, or a foldable cast of one
    * (`CAST(3 AS INT)` arrives as a Cast the optimizer may not have folded
    * yet, depending on rule order).
    */
  private def boundOf(e: Expression): Option[Long] = e match {
    case Literal(k: Int, IntegerType) => Some(k.toLong)
    case Literal(k: Long, LongType) => Some(k)
    case Literal(k: Short, ShortType) => Some(k.toLong)
    case Literal(k: Byte, ByteType) => Some(k.toLong)
    case c @ Cast(inner, dt, _, _) if isIntegral(dt) && c.foldable && boundOf(inner).isDefined =>
      Option(c.eval(null)).collect {
        case k: Int => k.toLong
        case k: Long => k
        case k: Short => k.toLong
        case k: Byte => k.toLong
      }
    case _ => None
  }

  /** k such that cond ≡ (rn ≤ k), or None. */
  private def limitFrom(cond: Expression, rn: Attribute): Option[Long] = cond match {
    case LessThanOrEqual(r, b) if isRank(r, rn) => boundOf(b)
    case LessThan(r, b) if isRank(r, rn) => boundOf(b).map(_ - 1)
    case EqualTo(r, b) if isRank(r, rn) => boundOf(b).filter(_ == 1L)
    case EqualTo(b, r) if isRank(r, rn) => boundOf(b).filter(_ == 1L)
    case GreaterThanOrEqual(b, r) if isRank(r, rn) => boundOf(b)
    case GreaterThan(b, r) if isRank(r, rn) => boundOf(b).map(_ - 1)
    case _ => None
  }

  /** Above this k the bounded-buffer operator's memory (k rows per group
    * per task) stops being obviously better than WindowExec's
    * sort-and-spill — leave large-k rank filters to the window plan.
    */
  val MaxRewriteK = 10000

  /** Spark's own InferWindowGroupLimit (a main-batch rule that runs BEFORE
    * user-provided optimizations) may already have inserted a
    * WindowGroupLimit below the Window from the very same rank predicate.
    * GroupedTopK subsumes it — keeping both would double-limit through two
    * sort pairs — so strip a same-spec row_number group limit that keeps at
    * least k rows per group (always the case when both derive from one
    * `rn <= k` filter; the guard keeps the strip provably lossless).
    */
  private def stripInferredLimit(child: LogicalPlan, w: Window, k: Long): LogicalPlan =
    child match {
      case wgl @ WindowGroupLimit(part, order, RowNumber(), limit, inner)
          if part == w.partitionSpec && order == w.orderSpec && limit >= k =>
        inner
      case _ => child
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      (for {
        rn <- rowNumberAttr(w)
        k <- limitFrom(cond, rn)
        if k > 0 && k <= MaxRewriteK
        if w.orderSpec.nonEmpty
        if !projList.exists(_.references.contains(rn))
        if projList.forall(_.references.subsetOf(w.child.outputSet))
      } yield Project(projList,
        GroupedTopK(w.partitionSpec, w.orderSpec, k.toInt,
          stripInferredLimit(w.child, w, k))))
        .getOrElse(p)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite the canonical top-k-per-key pattern
  *
  *   Project(p, Filter(rn <= k, Window(row_number() AS rn OVER
  *     (PARTITION BY keys ORDER BY o), child)))
  *
  * into [[TopKPerKeyPlan]] under `spark.graft.heapTopK=true` — users
  * keep writing standard window SQL and the planner swaps in the heap
  * operator (bounded memory, no per-partition sort, partial pass before
  * the exchange). Mirrors Catalyst's own InferWindowGroupLimit, which
  * targets the sort-based WindowGroupLimit; if that rule already fired,
  * the inserted WindowGroupLimit below the Window is stripped (the heap
  * operator subsumes it).
  *
  * Applies only when the rank column is consumed by nothing but the
  * filter (the Project above must not reference it), the window has
  * exactly that one expression, and the predicate is `rn <= k`,
  * `rn < k`, or `rn = 1` — the shapes dashboards and CDC compaction
  * generate.
  */
case class HeapTopKRewrite() extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.heapTopK", "false").toBoolean) plan
    else plan.transformUp {
      case p @ Project(projectList,
          Filter(cond, Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
          if part.nonEmpty &&
            !projectList.exists(_.references.contains(alias.toAttribute)) =>
        limitOf(cond, alias.toAttribute) match {
          case Some(k) if k > 0 =>
            val base = child match {
              case wgl: WindowGroupLimit => wgl.child
              case c => c
            }
            Project(projectList, TopKPerKeyPlan(part, order, k, base))
          case _ => p
        }
    }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: derive a pushable raw-column range predicate from a
  * comparison over an integral division of that column.
  *
  * CDC code naturally filters on derived offsets — `ts div 1000 > ckpt`
  * (µs view of a ns column). Catalyst cannot push such a predicate into a
  * parquet scan (the scan has `ts`, not `ts div 1000`), so the filter runs
  * post-scan and row-group pruning is lost — exactly the difference
  * between scanning one segment and scanning 100 TB. For non-negative
  * thresholds and a positive divisor, truncating division satisfies
  *   x div k > v  ⟹  x ≥ (v+1)·k      and
  *   x div k ≥ v  ⟹  x ≥ v·k  (v ≥ 1),
  * so the rule conjoins the implied raw-column bound (keeping the original
  * predicate — the rewrite is an implication, not an equivalence), which
  * the scan-pushdown phase then picks up. Registered via
  * [[graft.functions.GraftFunctions.installOptimizations]] (runtime) or
  * `spark.sql.extensions=graft.functions.GraftExtensions` (deploy-time).
  */
object DerivedPredicatePushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = split(cond)
      val implied = conjuncts.flatMap(impliedBound)
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (implied.isEmpty) f
      else Filter((conjuncts ++ implied).reduce(And), child)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other     => Seq(other)
  }

  private object DivByPosConst {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case d: IntegralDivide =>
        d.right match {
          case Literal(k: Long, LongType) if k > 0 => Some((d.left, k))
          case _                                   => None
        }
      case _ => None
    }
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case _                          => None
  }

  private def impliedBound(e: Expression): Option[Expression] = e match {
    case GreaterThan(DivByPosConst(x, k), v) =>
      longLit(v).collect { case vv if vv >= 0 && vv < Long.MaxValue / k - 1 =>
        GreaterThanOrEqual(x, Literal((vv + 1) * k, LongType))
      }
    case GreaterThanOrEqual(DivByPosConst(x, k), v) =>
      longLit(v).collect { case vv if vv >= 1 && vv < Long.MaxValue / k =>
        GreaterThanOrEqual(x, Literal(vv * k, LongType))
      }
    // mirrored literal-on-the-left forms
    case LessThan(v, DivByPosConst(x, k)) =>
      longLit(v).collect { case vv if vv >= 0 && vv < Long.MaxValue / k - 1 =>
        GreaterThanOrEqual(x, Literal((vv + 1) * k, LongType))
      }
    case LessThanOrEqual(v, DivByPosConst(x, k)) =>
      longLit(v).collect { case vv if vv >= 1 && vv < Long.MaxValue / k =>
        GreaterThanOrEqual(x, Literal(vv * k, LongType))
      }
    case _ => None
  }
}

object GraftOptimizations {
  /** Install the rule into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(DerivedPredicatePushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DerivedPredicatePushdown
    }
  }
}

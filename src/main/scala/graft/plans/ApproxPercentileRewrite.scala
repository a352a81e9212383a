package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Conf-gated optimizer rule (SURVEY §2.3 custom-operator ladder rung
  * (c): a `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions`): when `spark.graft.approxPercentile` is
  * true, every exact `percentile(x, p)` aggregate in a plan rewrites to
  * `approx_percentile(x, p, accuracy)` — the documented "same plan,
  * sketch-based at 100 TB" swap (e09c/p07/p08/e39/e40 scaladocs) made a
  * one-conf switch instead of a per-query edit. Exact percentile
  * buffers EVERY value of a group; the KLL-like approx sketch is
  * O(accuracy) per group — at profile granularity the exact form wins
  * on fidelity, at corpus scale it simply cannot run.
  *
  * OFF by default: the DuckDB oracles hash-match the exact semantics,
  * and flipping the flag is an explicit accuracy trade the user makes.
  * Scope guards: only scalar-percentage, frequency-1, non-reverse
  * percentiles whose result type is DOUBLE rewrite (array-percentage
  * and weighted forms keep their exact semantics); the result is cast
  * back to DOUBLE (approx returns the child's own type), so the rewrite
  * is type-preserving and downstream expressions are untouched.
  * GraftExtensions registers the rule; PlanSpec pins both the rewrite
  * (flag on → ApproximatePercentile in the plan, tolerance-close
  * values) and the default (flag off → bit-exact, no rewrite). */
case class ApproxPercentileRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import ApproxPercentileRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(Flag, "false").toBoolean) plan
    else {
      val accuracy = session.conf.get(AccuracyKey, DefaultAccuracy.toString).toInt
      // rewrite at the AggregateExpression level: the aggregate function
      // slot must hold an AggregateFunction, so the type-restoring Cast
      // wraps the whole aggregate, not the function inside it
      plan.transformAllExpressions {
        case ae: AggregateExpression => ae.aggregateFunction match {
          case p: Percentile if rewritable(p) =>
            Cast(ae.copy(aggregateFunction = new ApproximatePercentile(
              p.child, p.percentageExpression, Literal(accuracy))), DoubleType)
          case _ => ae
        }
      }
    }
  }

  private def rewritable(p: Percentile): Boolean =
    !p.reverse &&
      p.dataType == DoubleType && // scalar percentage, numeric child
      (p.frequencyExpression match {
        case Literal(1L, _) => true
        case Literal(1, _) => true
        case _ => false
      }) &&
      p.percentageExpression.foldable
}

object ApproxPercentileRewrite {
  val Flag = "spark.graft.approxPercentile"
  val AccuracyKey = "spark.graft.approxPercentile.accuracy"
  val DefaultAccuracy = 10000

  /** Run `body` with the rewrite enabled, restoring the previous flag. */
  def enabled[A](s: SparkSession)(body: => A): A = {
    val prev = s.conf.getOption(Flag)
    s.conf.set(Flag, "true")
    try body
    finally prev match {
      case Some(v) => s.conf.set(Flag, v)
      case None => s.conf.unset(Flag)
    }
  }
}

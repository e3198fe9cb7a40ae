package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query-processing rewrite: when
  * `spark.graft.approxDistinct=true`, every single-column
  * `COUNT(DISTINCT x)` in an [[Aggregate]] is rewritten to
  * HyperLogLog++ (`approx_count_distinct`) with
  * `spark.graft.approxDistinct.rsd` relative error (default 0.05).
  *
  * Why this exists: SURVEY.md §4.2's standing decision is that no custom
  * `Rule[LogicalPlan]` is REQUIRED for semantics — every reference
  * behavior plans with built-in operators — and that holds. This rule is
  * a PERFORMANCE MODE, off by default and semantics-preserving only up
  * to the declared error bound: at 100 TB an exact distinct is a full
  * shuffle of every distinct key (and, mixed with other aggregates, an
  * Expand that multiplies the scan), while HLL++ is a 1.5 KB sketch per
  * group that merges map-side. The BlinkDB / Snowflake "approx mode"
  * applied the Catalyst way: the user flips a conf, every query keeps
  * its text, the optimizer swaps the aggregate. No declared oracle query
  * runs with it on (oracle parity requires exact results); the rewrite
  * is pinned by ApproxRewriteSpec instead.
  *
  * MEASURED (round 7, `tools/ApproxAb` at synthesized sf1, local[32]):
  * per-day COUNT(DISTINCT) over 1M events is ~1.2× faster approx
  * (0.33→0.27 s pure shape) at 15k-distinct AND at 1M-distinct keys,
  * and a wash when mixed with other aggregates — with 5–7% estimate
  * error. In this single-JVM sandbox the distinct shuffle never leaves
  * the box, so the sketch's 1.5 KB-per-group vs full-key-exchange
  * advantage (the 100 TB argument above) barely registers; the rule
  * stays OFF by default and should only be flipped where the distinct
  * keys are large enough that their exchange dominates (network-shuffle
  * scale), never for the error-free local case. Recorded in SCALING.md
  * round 7.
  *
  * Scope guards: only a filter-less `Count` with exactly one child is
  * rewritten. Multi-column distinct keeps exact semantics (HLL++ takes
  * one expression), and a `FILTER (WHERE …)` distinct is left alone —
  * the core optimizer's RewriteDistinctAggregates turns it into an
  * Expand before user rules see it, so matching `isDistinct` there
  * would be dead code. Output attribute ids are preserved (`ae.copy`
  * keeps `resultId`, so parent plans keep resolving).
  *
  * Install: build-time via `GraftExtensions` (injectOptimizerRule) or
  * runtime via [[ApproxDistinctRewrite.install]] on a live session
  * (`experimental.extraOptimizations` — the same dual path the codegen
  * functions document).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct"
  val RsdKey  = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.05").toDouble
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressionsUp {
            case ae: AggregateExpression if ae.isDistinct && ae.filter.isEmpty &&
                ae.aggregateFunction.isInstanceOf[Count] &&
                ae.aggregateFunction.children.lengthCompare(1) == 0 =>
              ae.copy(
                aggregateFunction =
                  HyperLogLogPlusPlus(ae.aggregateFunction.children.head, rsd),
                isDistinct = false)
          }
      }
    }
  }

  /** Idempotently add the rule to a live session's optimizer. The rule
    * itself stays conf-gated, so installing it is free until the conf
    * flips. */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(this))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ this
}

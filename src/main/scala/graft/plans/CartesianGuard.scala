package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Raised at optimization time — BEFORE any task launches — when a plan
  * contains an unconditioned join of two large relations.
  */
class CartesianGuardException(msg: String) extends RuntimeException(msg)

/** Optimizer guardrail: fail fast on unconditioned (cartesian) joins of
  * two large relations — the single most expensive accident available to
  * a 100 TB cluster (a dropped join predicate or a comma-join typo turns
  * into |L|×|R| tasks that look "running" for hours). Semantics-
  * preserving by construction: the rule never rewrites anything, it only
  * raises at PLAN time, so the job dies in milliseconds instead of
  * melting the cluster.
  *
  * Injected through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule` — the `Rule[LogicalPlan]` extension point of
  * SURVEY §7.2) and OFF by default; production clusters opt in with
  * `spark.graft.guard.cartesian=true`. A cartesian stays allowed when
  * either side's optimizer estimate fits the broadcast threshold — a
  * broadcast nested-loop join over a small side is a legitimate plan
  * (the block-pair dimension tables of
  * [[graft.operators.Dedup]]'s embedding pairs, for example), and those
  * stats-based estimates are exactly what AQE itself plans by.
  */
case class CartesianGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.guard.cartesian", "false").toBoolean)
      return plan
    val threshold = {
      val t = spark.sessionState.conf.autoBroadcastJoinThreshold
      if (t > 0) t else 10L * 1024 * 1024
    }
    plan.foreach {
      // an explicit broadcast hint on either side is the user saying "I
      // know this side is small" — honoring it keeps the error message's
      // own advice ("broadcast() a side you know is small") true even
      // when the optimizer's stats estimate disagrees
      case Join(left, right, joinType, None, hint)
          if hint.leftHint.exists(_.strategy.contains(
               org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) ||
             hint.rightHint.exists(_.strategy.contains(
               org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) =>
      case Join(left, right, joinType, None, _) =>
        val (l, r) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
        if (l > threshold && r > threshold)
          throw new CartesianGuardException(
            s"cartesian guard: unconditioned $joinType join of two large " +
            s"relations (estimated $l × $r bytes, broadcast threshold " +
            s"$threshold). Add a join condition, or broadcast() a side " +
            s"you know is small, or disable spark.graft.guard.cartesian.")
      case _ =>
    }
    plan
  }
}

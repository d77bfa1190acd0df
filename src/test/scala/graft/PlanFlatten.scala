package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}

/** ONE shared AQE-aware physical-plan flattener for spec pins.
  *
  * `children` alone is not enough: under AQE a node below an exchange
  * lives inside a QueryStageExec, which exposes its subtree as `plan`,
  * not as a child — a `children`-only walk silently under-counts scans
  * and exchanges, turning a scan-budget or exchange-pin assertion into
  * a false pass. Every suite that audits executed plans must use this
  * (a Spark upgrade that changes stage nesting then needs exactly one
  * fix).
  */
object PlanFlatten {
  def flatten(pl: SparkPlan): Seq[SparkPlan] = pl match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }
}

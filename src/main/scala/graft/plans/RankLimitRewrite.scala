package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  CurrentRow, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual,
  RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding,
  WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-extension demo (`injectOptimizerRule` /
  * `experimental.extraOptimizations` — the third Catalyst extension
  * surface next to the injected functions and the planner strategy):
  * rewrites the declarative top-k-per-group pattern
  *
  *   Project(cols w/o rk, Filter(rk <= k, Window(row_number() AS rk)))
  *
  * to [[TopKPerGroupNode]]. Spark's own InferWindowGroupLimit already
  * caps the shuffle for this pattern, so the rewrite's value is the
  * physical diff documented on TopKPerGroup: no local sorts under the
  * group limits, no WindowExec materializing a rank that the filter
  * discards, and group-cap-bounded map memory. Off by default; opt in
  * per session with `spark.graft.rewriteRankLimit=true` (the rule is
  * conservative: it only fires when the rank column is dropped by the
  * enclosing Project, the partition keys are plain attributes, and the
  * frame is the default row_number frame).
  */
object RankLimitRewrite extends Rule[LogicalPlan] {

  val flag = "spark.graft.rewriteRankLimit"

  /** Register the rule + strategy on a session and enable the flag.
    * extraOptimizations run after the built-in batches, so the rule sees
    * the pattern post-InferWindowGroupLimit (handled below).
    */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    org.apache.spark.sql.graftshim.Bridge.addStrategy(spark, TopKPerGroupStrategy)
    spark.conf.set(flag, "true")
  }

  /** The k such that `pred` keeps exactly ranks 1..k, if it has that form. */
  private def limitOf(pred: Expression, rk: Attribute): Option[Int] = pred match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rk) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rk) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rk) => Some(1)
    case _ => None
  }

  /** Is this the single default-framed row_number window expression? */
  private def rowNumberAlias(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), spec), _))
        if spec.frameSpecification ==
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
      Some(a)
    case _ => None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(flag, "false") != "true") return plan
    plan.transformUp {
      case p @ Project(projectList, Filter(cond, w: Window))
          if rowNumberAlias(w).isDefined &&
            w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
            w.orderSpec.nonEmpty =>
        val rk = rowNumberAlias(w).get.toAttribute
        val preds = splitAnd(cond)
        val (rkPreds, rest) = preds.partition(_.references.contains(rk))
        val ks = rkPreds.map(limitOf(_, rk))
        val rankEscapes = projectList.exists(_.references.contains(rk)) ||
          rest.exists(_.references.contains(rk))
        if (ks.nonEmpty && ks.forall(_.isDefined) && !rankEscapes &&
            ks.flatten.min >= 1) {
          // InferWindowGroupLimit may already have slid a logical
          // WindowGroupLimit under the Window — the custom node replaces
          // that too (its partial/final pair subsumes the limit)
          val input = w.child match {
            case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case other => other
          }
          val topk = TopKPerGroupNode(
            w.partitionSpec.map(_.asInstanceOf[Attribute]),
            w.orderSpec, ks.flatten.min, input)
          Project(projectList,
            rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
        } else p
    }
  }
}

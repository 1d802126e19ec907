package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Physical-plan inspection for specs, by traversal rather than
  * string matching (plan rendering changes across Spark versions and
  * AQE settings; node types don't). Unwraps the wrapper nodes that
  * `SparkPlan.collect` cannot see through: AdaptiveSparkPlanExec
  * (children = Nil), query stages, and reused exchanges.
  */
object PlanProbe {

  /** Every node of the final executed plan, including nodes hidden
    * inside AQE wrappers. Call AFTER an action if the AQE final plan
    * is wanted; before one, this walks the initial plan.
    */
  def nodes(df: DataFrame): Seq[SparkPlan] = subtree(df.queryExecution.executedPlan)

  /** Every node of the subtree rooted at `p`, unwrapping AQE
    * wrappers the same way as [[nodes]]. */
  def subtree(p: SparkPlan): Seq[SparkPlan] = flatten(p)

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Shuffle exchanges hash-partitioned on EXACTLY the given column
    * names (order-insensitive), excluding reused stages so a reuse
    * counts once.
    */
  def hashExchangesOn(df: DataFrame, cols: String*): Seq[ShuffleExchangeExec] = {
    val want = cols.toSet
    nodes(df).collect {
      case e: ShuffleExchangeExec
          if (e.outputPartitioning match {
            case HashPartitioning(exprs, _) =>
              exprs.length == want.size &&
                exprs.flatMap(_.references.map(_.name)).toSet == want
            case _ => false
          }) => e
    }.distinct
  }
}

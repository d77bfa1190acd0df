package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Dev tool: print (shuffle, broadcast, reused-exchange, window) node
  * counts for each registered query's physical plan with AQE disabled —
  * the raw numbers behind PlanHygieneSpec's pinned-count table.
  * (`runMain graft.tools.PlanCounts [sfDir] [name...]`)
  */
object PlanCounts {
  def counts(plan: SparkPlan): (Int, Int, Int, Int) = {
    val all = plan.collect { case p => p }
    (all.count(_.isInstanceOf[ShuffleExchangeExec]),
      all.count(_.isInstanceOf[BroadcastExchangeExec]),
      all.count(_.isInstanceOf[ReusedExchangeExec]),
      all.count(_.isInstanceOf[WindowExec]))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val s0 = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s0.sparkContext.setLogLevel("ERROR")
    val s = s0.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    graft.api.Registry.all
      .filter(q => only.isEmpty || only(q.name))
      .foreach { q =>
        try {
          val (sh, bc, re, w) =
            counts(q.run(s, dir).queryExecution.executedPlan)
          println(f"${q.name}%-28s shuffle=$sh%-3d broadcast=$bc%-3d reused=$re%-3d window=$w%-3d")
        } catch { case e: Throwable =>
          println(s"${q.name} FAILED TO PLAN: ${e.getMessage}")
        }
      }
    s0.stop()
  }
}

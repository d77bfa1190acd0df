package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of a registered query
  * (`runMain graft.tools.ExplainQ <name> [sfDir]`) — the .explain
  * feedback loop PLANS.md's audits come from.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQ <queryName> [sfDir]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.api.Registry.byName(args(0)).run(s, dir)
    val plan = df.queryExecution.executedPlan.toString
    println(s"EXCHANGES=${"Exchange hashpartitioning".r.findAllIn(plan).length}")
    println(plan)
    s.stop()
  }
}

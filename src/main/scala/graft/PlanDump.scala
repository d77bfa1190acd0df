package graft

/** Plan-audit utility: prints the executed plan of each named registry
  * query (post-AQE count() first so adaptive decisions are real).
  * Usage: runMain graft.PlanDump <query name>... ; data dir from
  * SPARK_GRAFT_SF_DIR (default sf0.001).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val df = graft.api.Registry.byName(name).run(spark, dir)
      df.count() // let AQE finalize
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}

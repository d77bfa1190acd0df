package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-deliverable tool: writes `.explain("formatted")` output of the
  * named registry queries to `<outDir>/<name>_<tag>.txt` under the
  * Bench session shape (local[32], AQE on, GraftExtensions) so the
  * committed plan files match what the bench actually executes.
  * Usage: runMain graft.tools.ExplainFmt <outDir> <tag> <query>...
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale;
  * plan shape, not timing, is the point, but broadcast/AQE decisions
  * are size-dependent so the bench SF keeps them real).
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainFmt <outDir> <tag> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(2)) {
      val q = graft.api.Registry.byName(name)
      val df = q.run(spark, dir)
      df.count() // let AQE finalize
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"),
        s"== explain(formatted), sf=$dir ==\n$formatted\n" +
          s"== executedPlan (post-AQE) ==\n$executed")
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}

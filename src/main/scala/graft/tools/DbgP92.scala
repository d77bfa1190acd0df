package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: cumulative stage decomposition of p92_pipeline_e2e —
  * times a count() after each stage prefix (min-of-3 each, Bench
  * session shape) so the chain's cost attributes to stages instead of
  * one number (`runMain graft.tools.DbgP92 [sfDir]`). The prefixes are
  * [[graft.queries.PipelineE2e.stageThunks]] — the same thunks Bench
  * reports in the artifact's `e2e_pipeline.stages`, so the tool can
  * never drift from the query it decomposes.
  */
object DbgP92 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    graft.queries.PipelineE2e.stageThunks(s, dir).foreach {
      case (label, f) =>
        f() // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label%-16s min=${ts.map(_._1).min}%.3f rows=${ts.head._2}")
    }
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose q87's DPP read (round-17 verdict watch item) —
  * the full dim-driven read vs its two legs timed alone: the DIM leg
  * (orders scan + month filter + distinct) and the FACT leg (the
  * pruned partitions aggregated with the months as static literals —
  * the floor runtime partition pruning can reach). The gap between
  * full and dim+fact is the DPP subquery/broadcast machinery itself.
  * (`runMain graft.tools.DbgQ87 [sfDir]`)
  */
object DbgQ87 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val read = graft.queries.StorageLayout.q87Dpp(s, dir)
    val path = graft.queries.StorageLayout.q87FactPath(dir)
    def time(tag: String)(f: () => Long): Unit = {
      f() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-12s min=${ts.head}%.3f median=${ts(2)}%.3f")
    }
    val dim = () => graft.queries.StorageLayout.q87Dim(s, dir)
    val months = dim().collect().map(_.getString(0)).sorted
    println(s"pruned months: ${months.length} of " +
      s.read.parquet(path).select("ship_month").distinct().count())
    time("full_dpp")(() => read().count())
    time("dim_leg")(() => dim().count())
    time("fact_static")(() => graft.queries.StorageLayout
      .q87FactStatic(s, dir, months.toSeq).count())
    s.stop()
  }
}

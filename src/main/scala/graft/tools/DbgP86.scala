package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose p86_exact_auc's cost — scan+score alone, the
  * grouped score histogram, and the full two-phase AUC — min-of-5 each
  * under the Bench session shape, to attribute drift between the scan
  * and the aucRoc machinery (`runMain graft.tools.DbgP86 [sfDir]`).
  */
object DbgP86 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def scored = graft.api.Tables.t(s, dir, "documents").select(
      graft.functions.Fns.meanTokenLen6dp(col("text")).as("mean_tok_len"),
      (col("lang") === "en").as("is_en"))
    def time(label: String, n: Int = 5)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-12s min=${ts.head}%.3f median=${ts(n / 2)}%.3f")
    }
    time("scan+score") { scored.count() }
    time("group") { scored.groupBy("mean_tok_len").count().count() }
    time("full_auc", 15) {
      graft.operators.EvalMetrics
        .aucRoc(scored, "mean_tok_len", "is_en").count()
    }
    s.stop()
  }
}

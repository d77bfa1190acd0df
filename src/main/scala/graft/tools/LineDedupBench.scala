package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B LineDedup's `persistLines` flag on the p60 shape at
  * sf0.1 — the exploded lines frame has two consumers (the boilerplate
  * dictionary aggregate and the rewrite join), so the flag trades one
  * cached materialization against scanning + re-lining the corpus
  * twice. (`runMain graft.tools.LineDedupBench [sfDir]`)
  */
object LineDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def lined = {
      val ts = split(col("text"), " ")
      val nL = ((size(ts) + lit(7)) / lit(8)).cast("int")
      graft.api.Tables.t(s, dir, "documents").select(col("doc_id"),
        array_join(transform(sequence(lit(0), nL - 1),
          i => array_join(slice(ts, i * lit(8) + lit(1), lit(8)), " ")),
          "\n").as("text"))
    }

    def run(persist: Boolean): Long =
      graft.operators.LineDedup.dropSharedLines(lined, "doc_id", "text",
        "\n", minDocs = 3, persistLines = persist).count()

    def time(label: String, f: () => Long): Unit = {
      f() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${runs.min}%.3f s  median ${runs.sorted.apply(1)}%.3f s")
    }
    time("persistLines=false (corpus re-lined twice)", () => run(false))
    time("persistLines=true  (one cached explode)  ", () => run(true))
    s.stop()
  }
}

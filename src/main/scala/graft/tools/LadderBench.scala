package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

/** Dev tool: A/B the p56 repeated-span ladder's doc prune (exact by
  * window monotonicity — the A/B measures cost, equality is spec-pinned).
  * min-of-3 wall seconds per variant at the given scale.
  * (`runMain graft.tools.LadderBench [sfDir]`)
  */
object LadderBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    def run(prune: Boolean): (Double, Long) = {
      var rows = 0L
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = TextAnalysis.repeatedSpansLadder(docs, "doc_id", "text",
          baseN = 8, minDf = 3, maxN = 64, pruneDocs = prune).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (secs, rows)
    }
    val (pruned, rowsP) = run(prune = true)
    val (unpruned, rowsU) = run(prune = false)
    require(rowsP == rowsU, s"prune changed the result: $rowsP vs $rowsU")
    println(f"""{"ladder_pruned_s": $pruned%.3f, """ +
      f""""ladder_unpruned_s": $unpruned%.3f, "rows": $rowsP}""")
    s.stop()
  }
}

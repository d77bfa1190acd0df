package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDedup

/** Dev tool: measure what index compaction buys at PROBE time — build a
  * bucketed dedup index, accrete files with many small appends (the
  * trickle-ingest wear pattern), time a narrow probe, compact, time the
  * same probe against the compacted index.
  * (`runMain graft.tools.CompactProbeBench [sfDir]`)
  */
object CompactProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.api.Tables.t(s, dir, "documents")
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_bench").toString
    val idx = s"$root/idx"
    val out = s"$root/idx_compacted"
    val p = IncrementalDedup.Params()

    // base index from 60% of the corpus, then 20 trickle appends of ~2%
    // each — every append adds a file set per table
    IncrementalDedup.buildIndex(
      docs.filter(col("doc_id") % 10 < 6), "doc_id", "text", p, idx)
    for (b <- 0 until 20)
      IncrementalDedup.appendBatch(
        docs.filter(col("doc_id") % 10 === 6 &&
          floor(col("doc_id") / 10) % 20 === b),
        "doc_id", "text", p, idx)
    val probe = docs.filter(col("doc_id") % 10 === 9).limit(10)

    def time(label: String, path: String): Unit = {
      def run() = IncrementalDedup.nearDupsAgainstIndex(
        s, probe, "doc_id", "text", p, path).count()
      run() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      val files = Seq("bands", "shingles").map(t =>
        graft.sources.FsMeta.listFiles(s"$path/$t")
          .count(_.endsWith(".parquet"))).sum
      println(f"$label: files=$files probe min ${runs.min}%.3f s " +
        f"median ${runs.sorted.apply(1)}%.3f s")
    }
    time("accreted ", idx)
    val stats = IncrementalDedup.compactIndex(s, idx, out)
    println(s"compaction: $stats")
    time("compacted", out)
    s.stop()
  }
}
